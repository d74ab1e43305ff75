"""CLIP-guided VQGAN synthesis (reference: clip_vqgan.py, after Crowson).

A VQGAN latent z is optimised with Adam(0.05) so CLIP embeddings of 64
random cutouts of the decoded image approach content/style image embeddings
and move along text directions (+style_text, -content_text), using spherical
distances.  The whole iteration — decode, cutouts, CLIP forward, backward,
Adam update, z clamp to the codebook range — is one jitted ``lax.scan``
step on device.

Divergences from the reference, deliberate:
- no forced host round-trip of the codebook (clip_vqgan.py:504-505's CUDA
  workaround doesn't apply);
- no 2-GPU decoder split (GSPMD shards by annotation instead);
- masks are resampled to the latent grid (the reference resamples to image
  size and would not broadcast against z, clip_vqgan.py:451-455);
- cutouts sample bilinearly at static shapes (see ops/cutouts.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import vqgan as vq
from ..models.clip import CLIP, tokenize
from ..models.clip.model import CLIP_MEAN, CLIP_STD
from ..ops.cutouts import make_cutouts
from ..ops.grads import clamp_with_grad, replace_grad, spherical_dist
from ..ops.resize import resize_bilinear


def size_to_fit(size, max_dim, scale_up=False):
    """(w, h) scaled to fit max_dim (reference clip_vqgan.py:222-231)."""
    w, h = size
    if not scale_up and max(h, w) <= max_dim:
        return w, h
    new_w, new_h = max_dim, max_dim
    if h > w:
        new_w = round(max_dim * w / h)
    else:
        new_h = round(max_dim * h / w)
    return new_w, new_h


def _missing_clip_checkpoint(candidates) -> None:
    """Missing CLIP weights are an ERROR by default (random CLIP guidance is
    meaningless); --allow_random_weights / MAUA_ALLOW_RANDOM_WEIGHTS opts out."""
    from ..models.registry import allow_random_weights

    if not allow_random_weights(None):
        raise FileNotFoundError(
            f"No CLIP checkpoint (searched {list(candidates)}).\n"
            f"Convert the OpenAI .pt once with:\n"
            f"    python -m maua_style_tpu.models.clip.convert <clip.pt> {candidates[0]}\n"
            f"or pass --allow_random_weights to run with deterministic random "
            f"weights (outputs will be meaningless; for tests/smoke only)."
        )


def _load_clip(clip_backbone: str):
    from ..models.clip.resnet import RESNET_CONFIGS, CLIPResNet

    if clip_backbone in RESNET_CONFIGS:
        slug = clip_backbone.lower()
        candidates = (f"modelzoo/clip_{slug}.npz",)
        for cand in candidates:
            if os.path.exists(cand):
                from ..models.clip.convert import load_clip_npz

                return CLIPResNet(clip_backbone, load_clip_npz(cand))
        _missing_clip_checkpoint(candidates)
        print(f"Warning: no CLIP checkpoint (modelzoo/clip_{slug}.npz); using deterministic random init.")
        return CLIPResNet(clip_backbone)
    if clip_backbone != "ViT-B/32":
        raise NotImplementedError(
            f"CLIP backbone {clip_backbone!r} not implemented in the JAX port yet; "
            "use ViT-B/32, RN50, RN101, or RN50x4"
        )
    candidates = ("modelzoo/clip_vitb32.npz", "modelzoo/clip-vit-b-32.npz")
    for cand in candidates:
        if os.path.exists(cand):
            from ..models.clip.convert import load_clip_npz

            return CLIP(load_clip_npz(cand))
    _missing_clip_checkpoint(candidates)
    print("Warning: no CLIP checkpoint (modelzoo/clip_vitb32.npz); using deterministic random init.")
    return CLIP()


class ClipVQGANEngine:
    """Holds the VQGAN + CLIP params and the jitted optimisation step; the
    equivalent of the reference's load_models + optimize/optimize_cached
    globals (clip_vqgan.py:391-431, 566-601)."""

    def __init__(
        self,
        vqgan_dir: str = "imagenet_16384",
        clip_backbone: str = "ViT-B/32",
        cutn: int = 64,
        learning_rate: float = 0.05,
        seed: int = 0,
    ):
        self.vq_params, self.vq_cfg = vq.load_vqgan(vqgan_dir, seed)
        self.clip = _load_clip(clip_backbone)
        self.cut_size = self.clip.input_resolution
        self.cutn = cutn
        self.res = self.vq_cfg.downsample_factor
        self.learning_rate = learning_rate
        codebook = self.vq_params["codebook"]
        self.z_min = codebook.min(axis=0).reshape(1, 1, 1, -1)
        self.z_max = codebook.max(axis=0).reshape(1, 1, 1, -1)
        self._key = jax.random.PRNGKey(seed)
        self.target_embeds = None  # [from_embed, to_embed, style_embeds] cache for optimize_cached

        cfg = self.vq_cfg

        from ..models.clip.resnet import CLIPResNet, encode_image_resnet

        if isinstance(self.clip, CLIPResNet):
            rn_cfg = self.clip.rn_cfg
            self._image_encoder = lambda prm, imgs: encode_image_resnet(prm, imgs, rn_cfg)
        else:
            clip_cfg = self.clip.cfg
            self._image_encoder = lambda prm, imgs: CLIP._encode_image(prm, imgs, clip_cfg)
        # text tower (both backbones use the ViT-style text transformer); the
        # pure fn is folded into the runner's first-chunk prologue so a
        # text-guided run loads NO separate text-encoder executable
        txt_cfg = self.clip.cfg
        self._encode_text_fn = lambda prm, t: CLIP._encode_text(prm, t, txt_cfg)

        def synth(vq_params, z):
            z_q = vq.quantize(z, vq_params["codebook"])
            out = vq.decode(vq_params, z_q, cfg)
            return clamp_with_grad((out + 1.0) / 2.0, 0.0, 1.0)

        self._synth = jax.jit(synth)

        def embed_cutouts(clip_params, key, img):
            cuts = make_cutouts(key, img, self.cut_size, self.cutn)
            cuts = (cuts - CLIP_MEAN) / CLIP_STD
            return self._image_encoder(clip_params, cuts)

        # unjitted fn is reused as the runner's first-chunk prologue; the
        # jitted wrapper only loads for style-image embeds / direct API use
        self._embed_cutouts_fn = embed_cutouts
        self._embed_cutouts = jax.jit(embed_cutouts)

        def encode_z(vq_params, img01):
            pre = vq.encode(vq_params, img01 * 2.0 - 1.0, cfg)
            return jax.lax.stop_gradient(vq.quantize(pre, vq_params["codebook"]))

        self._encode_z_fn = encode_z
        self._encode_z = jax.jit(encode_z)
        self._runners: dict = {}
        # one Adam instance per engine; its init runs inside the runner's
        # first-chunk prologue (optax states from equal-hyperparameter
        # instances are interchangeable), so no separate init program
        self._opt = optax.adam(self.learning_rate)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- target embedding --------------------------------------------------

    def embed_image(self, img01: np.ndarray) -> jax.Array:
        """(1, H, W, 3) [0,1] -> (cutn, embed_dim) cutout embeddings."""
        return self._embed_cutouts(self.clip.params, self._next_key(), jnp.asarray(img01, jnp.float32))

    def embed_text(self, text: str | None):
        if text is None:
            return None
        return self.clip.encode_text(tokenize(text))

    def style_targets(self, styles, content_text, style_text):
        style_embeds = [self.embed_image(s) for s in styles] if styles else None
        return [self.embed_text(content_text), self.embed_text(style_text), style_embeds]

    update_styles = style_targets

    # -- the jitted optimisation loop --------------------------------------

    def _runner_for(self, n_iters: int, n_styles: int, has_from: bool, has_to: bool, has_mask: bool,
                    content_weight: float, style_weight: float, text_weight: float,
                    text_in_program: bool = False):
        key = (n_iters, n_styles, has_from, has_to, has_mask, content_weight, style_weight,
               text_weight, text_in_program)
        if key in self._runners:
            return self._runners[key]

        opt = optax.adam(self.learning_rate)
        cutn, cut_size = self.cutn, self.cut_size
        image_encoder = self._image_encoder

        def losses_of(vq_params, clip_params, z, rng, mask, content_embed, from_embed, to_embed, style_embeds):
            z_eff = replace_grad(z, z * mask) if has_mask else z
            z_q = vq.quantize(z_eff, vq_params["codebook"])
            dec = vq.decode(vq_params, z_q, self.vq_cfg)
            out = clamp_with_grad((dec + 1.0) / 2.0, 0.0, 1.0)
            cuts = make_cutouts(rng, out, cut_size, cutn)
            cuts = (cuts - CLIP_MEAN) / CLIP_STD
            out_embeds = image_encoder(clip_params, cuts)
            terms = [spherical_dist(out_embeds, content_embed).mean() * content_weight]
            for s in range(n_styles):
                terms.append(spherical_dist(out_embeds, style_embeds[s]).mean() * style_weight)
            terms.append(
                spherical_dist(out_embeds, from_embed).mean() * -text_weight if has_from else jnp.zeros(())
            )
            terms.append(
                spherical_dist(out_embeds, to_embed).mean() * text_weight if has_to else jnp.zeros(())
            )
            return sum(terms), jnp.stack(terms)

        encode_z_fn = self._encode_z_fn
        embed_cutouts_fn = self._embed_cutouts_fn
        encode_text_fn = self._encode_text_fn

        # z_min/z_max are ARGUMENTS, not closure constants: traced constants
        # are baked into the HLO, so any change in codebook values would
        # change the persistent-cache key and force a fresh multi-minute
        # compile of the scan program (observed: every re-init recompiled).
        # The first-chunk prologue (z encode, content-cutout embed, TEXT
        # embeds when text_in_program, Adam init) runs under lax.cond inside
        # the SAME program, so a whole text-guided optimize() call — any
        # number of chunks — loads exactly ONE device executable
        # (PERF.md "Process-startup costs": each per-process load costs
        # 30-125 s through a tunneled chip; round 4 still paid a second load
        # for the standalone text encoder).
        def run(vq_params, clip_params, first, init01, content01, z_in, opt_state_in, keys, mask,
                content_embed_in, from_embed, to_embed, style_embeds, embed_key, z_min, z_max,
                from_tokens, to_tokens):
            z = jax.lax.cond(
                first,
                lambda: encode_z_fn(vq_params, init01),
                lambda: z_in,
            )
            content_embed = jax.lax.cond(
                first,
                lambda: embed_cutouts_fn(clip_params, embed_key, content01),
                lambda: content_embed_in,
            )
            if text_in_program and has_from:
                from_embed = jax.lax.cond(
                    first,
                    lambda: encode_text_fn(clip_params, from_tokens),
                    lambda: from_embed,
                )
            if text_in_program and has_to:
                to_embed = jax.lax.cond(
                    first,
                    lambda: encode_text_fn(clip_params, to_tokens),
                    lambda: to_embed,
                )
            opt_state = jax.lax.cond(
                first,
                lambda: opt.init(z),
                lambda: opt_state_in,
            )

            def step(carry, rng):
                z, st = carry
                (_, terms), grad = jax.value_and_grad(losses_of, argnums=2, has_aux=True)(
                    vq_params, clip_params, z, rng, mask, content_embed, from_embed, to_embed, style_embeds
                )
                updates, st = opt.update(grad, st, z)
                z = optax.apply_updates(z, updates)
                z = jnp.clip(z, z_min, z_max)
                return (z, st), terms

            (z, opt_state), log = jax.lax.scan(step, (z, opt_state), keys)
            # decode the final z in the SAME program: the separate synth
            # executable never has to load on the optimize path — chunk
            # ends and the final image all come out of this runner
            z_q = vq.quantize(z, vq_params["codebook"])
            out01 = clamp_with_grad((vq.decode(vq_params, z_q, self.vq_cfg) + 1.0) / 2.0, 0.0, 1.0)
            return z, opt_state, log, out01, content_embed, from_embed, to_embed

        self._runners[key] = jax.jit(run, donate_argnums=(5, 6))
        return self._runners[key]

    # -- public API ---------------------------------------------------------

    def optimize(
        self,
        init: np.ndarray,
        content: np.ndarray,
        styles: list[np.ndarray] | None,
        mask: np.ndarray | None,
        content_text: str | None,
        style_text: str | None,
        content_weight: float = 1.0,
        style_weight: float = 1.0,
        text_weight: float = 1.0,
        iterations: int = 500,
        save_every: int = 0,
        save_callback=None,
        target_embeds=None,
    ) -> np.ndarray:
        """Images are (1, H, W, 3) RGB in [0, 1].  Returns the synthesised
        image in the same format (reference clip_vqgan.py:525-563)."""
        from ..utils import on_host

        h, w = init.shape[1:3]
        side_y = (h // self.res) * self.res
        side_x = (w // self.res) * self.res
        # host-side resize: eager device ops through a tunneled TPU are
        # whole compile+load round trips each (see utils.on_host)
        _resize = on_host(lambda a: resize_bilinear(jnp.asarray(a, jnp.float32), size=(side_y, side_x)))
        init = np.asarray(_resize(init))
        content = np.asarray(_resize(content))

        # z encode, content-cutout embed and Adam init all happen INSIDE the
        # first runner call (lax.cond prologue) — no separate encode_z /
        # embed_cutouts executables on this path.  Only placeholder buffers
        # with the right shapes are built here, on the host.
        zc = int(self.z_min.shape[-1])
        z_shape = (1, side_y // self.res, side_x // self.res, zc)
        embed_key = self._next_key()  # same key-stream slot embed_image(content) used
        clip_params_sds = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.clip.params
        )
        # with no precomputed targets, text prompts ride into the runner as
        # TOKENS and embed inside its first-chunk prologue — a text-guided
        # run then loads exactly one device executable (style images, whose
        # shapes vary, still embed eagerly via the standalone program)
        text_in_program = target_embeds is None
        ctx = int(self.clip.cfg.context_length)
        if text_in_program:
            style_embeds = [self.embed_image(s) for s in styles] if styles else []
            from_tokens = jnp.asarray(tokenize(content_text), jnp.int32) if content_text is not None else None
            to_tokens = jnp.asarray(tokenize(style_text), jnp.int32) if style_text is not None else None
            has_from, has_to = from_tokens is not None, to_tokens is not None
            txt_sds = jax.eval_shape(
                self._encode_text_fn, clip_params_sds, jax.ShapeDtypeStruct((1, ctx), jnp.int32)
            )
            from_embed = np.zeros(txt_sds.shape, txt_sds.dtype) if has_from else None
            to_embed = np.zeros(txt_sds.shape, txt_sds.dtype) if has_to else None
        else:
            from_embed, to_embed, style_embeds = target_embeds
            style_embeds = style_embeds or []
            has_from, has_to = from_embed is not None, to_embed is not None
            from_tokens = to_tokens = None

        if mask is not None:
            mask = np.asarray(
                on_host(lambda a: resize_bilinear(jnp.asarray(a, jnp.float32), size=(z_shape[1], z_shape[2])))(mask)
            )
            mask_arr = jnp.asarray(mask)
        else:
            mask_arr = jnp.ones((), jnp.float32)

        zeros_like_shapes = lambda tree: jax.tree_util.tree_map(  # noqa: E731
            lambda s: np.zeros(s.shape, s.dtype), tree
        )
        z_sds = jax.ShapeDtypeStruct(z_shape, jnp.float32)
        z = np.zeros(z_shape, np.float32)
        opt_state = zeros_like_shapes(jax.eval_shape(self._opt.init, z_sds))
        content_embed = zeros_like_shapes(
            jax.eval_shape(
                self._embed_cutouts_fn,
                jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.clip.params),
                jax.ShapeDtypeStruct((2,), jnp.uint32),
                jax.ShapeDtypeStruct(content.shape, jnp.float32),
            )
        )
        init01 = jnp.asarray(init, jnp.float32)
        content01 = jnp.asarray(content, jnp.float32)
        first = True
        out = None
        losses_log = []
        done = 0
        chunk = iterations if save_every <= 0 else save_every
        tok_placeholder = jnp.zeros((1, ctx), jnp.int32)
        while done < iterations:
            n = min(chunk, iterations - done)
            runner = self._runner_for(
                n, len(style_embeds), has_from, has_to, mask is not None,
                content_weight, style_weight, text_weight, text_in_program,
            )
            keys = jax.random.split(self._next_key(), n)
            z, opt_state, log, out, content_embed, from_embed_out, to_embed_out = runner(
                self.vq_params, self.clip.params, np.bool_(first), init01, content01, z, opt_state,
                keys, mask_arr, content_embed,
                from_embed if from_embed is not None else jnp.zeros((1, 1)),
                to_embed if to_embed is not None else jnp.zeros((1, 1)), style_embeds,
                embed_key, self.z_min, self.z_max,
                from_tokens if from_tokens is not None else tok_placeholder,
                to_tokens if to_tokens is not None else tok_placeholder,
            )
            # later chunks reuse the embeds the first chunk computed in-program
            if has_from:
                from_embed = from_embed_out
            if has_to:
                to_embed = to_embed_out
            first = False
            losses_log.append(np.asarray(log))
            done += n
            if save_callback is not None and done < iterations:
                save_callback(np.asarray(out), done)

        self.last_loss_log = np.concatenate(losses_log, axis=0)
        if save_callback is not None:
            save_callback(np.asarray(out), done)
        return np.asarray(out)

    def optimize_cached(self, init, content, styles, mask, content_text, style_text,
                        content_weight, style_weight, text_weight, iterations) -> np.ndarray:
        """Per-frame variant reusing cached style/text targets
        (reference clip_vqgan.py:566-601)."""
        if self.target_embeds is None:
            self.target_embeds = self.style_targets(styles, content_text, style_text)
        return self.optimize(
            init, content, None, mask, None, None,
            content_weight, style_weight, text_weight, iterations,
            target_embeds=self.target_embeds,
        )


_ENGINE: ClipVQGANEngine | None = None


def get_engine(vqgan_dir: str, clip_backbone: str) -> ClipVQGANEngine:
    global _ENGINE
    if _ENGINE is None:
        _ENGINE = ClipVQGANEngine(vqgan_dir, clip_backbone)
    return _ENGINE


def main(argv=None):
    """Standalone CLI (reference clip_vqgan.py:604-685)."""
    import argparse
    from pathlib import Path

    from PIL import Image

    # fmt: off
    parser = argparse.ArgumentParser("clip_vqgan")
    parser.add_argument("--content", type=str)
    parser.add_argument("--content_text", type=str)
    parser.add_argument("--style_text", type=str)
    parser.add_argument("--style", type=str, default=None)
    parser.add_argument("--image_size", default=256, type=int)
    parser.add_argument("--text_weight", default=1.0, type=float)
    parser.add_argument("--style_weight", default=1.0, type=float)
    parser.add_argument("--content_weight", default=1.0, type=float)
    parser.add_argument("--vqgan_dir", type=str, default="imagenet_16384")
    parser.add_argument("--clip_backbone", type=str, default="ViT-B/32")
    parser.add_argument("--out_dir", default="./output/")
    parser.add_argument("--mask_path", type=str)
    parser.add_argument("--invert_mask", action="store_true")
    parser.add_argument("--force_square", action="store_true")
    parser.add_argument("--iterations", default=500, type=int)
    parser.add_argument("--seed", default=-1, type=int)
    parser.add_argument("--allow_random_weights", action="store_true",
                        help="proceed with deterministic random weights when checkpoints are missing")
    parser.add_argument("--download_weights", action="store_true",
                        help="self-provision missing CLIP/VQGAN checkpoints + BPE vocab "
                             "(reference clip_vqgan.py:160-201 behaviour; needs egress)")
    # fmt: on
    args = parser.parse_args(argv)

    if args.allow_random_weights:
        os.environ["MAUA_ALLOW_RANDOM_WEIGHTS"] = "1"

    if args.download_weights:
        from ..io.download import SOURCES, ensure_weights

        clip_name = "clip_rn50" if args.clip_backbone.startswith("RN50") else "clip_vitb32"
        wanted = [clip_name, "bpe_vocab"] + ([args.vqgan_dir] if args.vqgan_dir in SOURCES else [])
        ensure_weights(wanted)

    if args.seed >= 0:
        np.random.seed(args.seed)

    out_name = (
        "-".join(
            [Path(args.content).stem]
            + (args.content_text.split() if args.content_text else [])
            + ([Path(args.style).stem] if args.style is not None else [])
            + (args.style_text.split() if args.style_text else [])
            + [Path(args.vqgan_dir).stem]
        ).lower()
        + ".jpg"
    )

    def load01(path, max_dim, force_square=False, scale_up=True):
        img = Image.open(path).convert("RGB")
        if force_square:
            img = img.resize((max_dim, max_dim), Image.LANCZOS)
        else:
            sx, sy = size_to_fit(img.size, max_dim, scale_up)
            img = img.resize((sx, sy), Image.LANCZOS)
        return np.asarray(img, np.float32)[None] / 255.0

    styles = None
    if args.style is not None:
        styles = [load01(s, args.image_size) for s in args.style.split(",")]

    if args.content == "random":
        init = np.random.rand(1, args.image_size, args.image_size, 3).astype(np.float32)
    else:
        init = load01(args.content, args.image_size, args.force_square)

    mask = None
    if args.mask_path:
        pil = Image.open(args.mask_path)
        if "A" in pil.getbands():
            pil = pil.getchannel("A")
        elif "L" in pil.getbands():
            pil = pil.getchannel("L")
        else:
            raise RuntimeError("Mask must have an alpha channel or be one channel")
        mask = np.asarray(pil, np.float32)[None, :, :, None] / 255.0
        if args.invert_mask:
            mask = 1 - mask

    os.makedirs(args.out_dir, exist_ok=True)
    # reference seeds torch globally (clip_vqgan.py:604-685 __main__); here the
    # engine key drives cutout sampling, so --seed must reach it (-1 = random)
    engine = ClipVQGANEngine(
        args.vqgan_dir,
        args.clip_backbone,
        seed=args.seed if args.seed >= 0 else int(np.random.randint(2**31)),
    )

    def save(img, i):
        Image.fromarray((np.clip(img[0], 0, 1) * 255).astype(np.uint8)).save(args.out_dir + "/" + out_name)
        log = getattr(engine, "last_loss_log", None)
        if log is not None:
            print(f"i: {i}, loss: {log[-1].sum():g} [{', '.join(f'{v:g}' for v in log[-1])}]")

    out = engine.optimize(
        init=init,
        content=init.copy(),
        styles=styles,
        mask=mask,
        content_text=args.content_text,
        style_text=args.style_text,
        content_weight=args.content_weight,
        style_weight=args.style_weight,
        text_weight=args.text_weight,
        iterations=args.iterations,
        save_every=50,
        save_callback=save,
    )
    save(out, args.iterations)
    print(f"saved {args.out_dir}/{out_name}")


if __name__ == "__main__":
    main()
