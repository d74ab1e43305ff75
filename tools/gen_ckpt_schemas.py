"""Generate the vendored key->shape listings of the PUBLISHED checkpoints the
reference self-provisions (tests/fixtures/ckpt_schemas/*.txt).

VERDICT r3 "Missing #1": the converters were only ever fed torch replicas the
repo itself builds; these fixtures pin the real artifacts' schemas so any
naming/shape drift fails tests *now*, not the day real weights arrive.

Provenance, per family:

- VGG/NIN feature nets — AUTHORITATIVE.  The reference loads them with
  ``strict=True`` into torch modules fully defined in /root/reference/models.py
  (VGG:16-28, VGG_SOD:31-43, VGG_FCN32S:46-57, VGG_PRUNED:60-71, NIN:74-113,
  build_sequential:116-132, channel_list:135-139), so the published state
  dicts' schemas are exactly those modules' state_dicts.  vgg19/vgg16 are
  emitted in the RAW download form (classifier.1/.4/.6 — the reference remaps
  1->0, 4->3 before saving, models.py:298-304); converters must accept both.
- OpenAI CLIP ViT-B/32 + RN50 — from the openai/CLIP model.py architecture
  (the reference's CLIP submodule; clip_vqgan.py:420 loads via clip.load).
  Includes BatchNorm num_batches_tracked and the logit_scale scalar.
- taming VQGAN vqgan_imagenet_f16_16384 — from taming-transformers'
  VQModel/Encoder/Decoder (the reference's VQGAN submodule;
  clip_vqgan.py:204-219).  The training-only ``loss.*`` subtree (LPIPS +
  discriminator) is represented by sentinel keys; converters ignore it.
- sniklaus pytorch-spynet / pytorch-pwc — from the sniklaus repos' run.py
  module definitions; published files carry the ORIGINAL ``module*`` naming
  (his loaders rename module->net at load time).
- sniklaus pytorch-unflow (network-css.pytorch) — the FlowNetC first stage's
  ordered shape signature (the part our UnFlow implements); our converter is
  shape-ordered so only order+shapes are load-bearing.  Key names here are
  synthesized placeholders, marked as such.

Run: python tools/gen_ckpt_schemas.py   (writes the fixture dir)
"""

from __future__ import annotations

import os

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "ckpt_schemas")

VGG16_CH = [64, 64, "P", 128, 128, "P", 256, 256, 256, "P", 512, 512, 512, "P", 512, 512, 512, "P"]
VGG19_CH = [64, 64, "P", 128, 128, "P", 256, 256, 256, 256, "P", 512, 512, 512, 512, "P", 512, 512, 512, 512, "P"]
VGG16P_CH = [24, 22, "P", 41, 51, "P", 108, 89, 111, "P", 184, 276, 228, "P", 512, 512, 512, "P"]


def vgg_features(channels):
    """Sequential indices of build_sequential (conv+relu pairs, pools)."""
    rows, i, cin = [], 0, 3
    for c in channels:
        if c == "P":
            i += 1
        else:
            rows.append((f"features.{i}.weight", (c, cin, 3, 3)))
            rows.append((f"features.{i}.bias", (c,)))
            cin = c
            i += 2
    return rows


def linear_classifier(indices, dims):
    rows = []
    for i, (out, inn) in zip(indices, dims):
        rows.append((f"classifier.{i}.weight", (out, inn)))
        rows.append((f"classifier.{i}.bias", (out,)))
    return rows


def nin_features():
    # reference models.py:74-113 sequential registration order
    convs = [  # (index, out, in, k)
        (0, 96, 3, 11), (2, 96, 96, 1), (4, 96, 96, 1),
        (7, 256, 96, 5), (9, 256, 256, 1), (11, 256, 256, 1),
        (14, 384, 256, 3), (16, 384, 384, 1), (18, 384, 384, 1),
        (22, 1024, 384, 3), (24, 1024, 1024, 1), (26, 1000, 1024, 1),
    ]
    rows = []
    for i, o, c, k in convs:
        rows.append((f"features.{i}.weight", (o, c, k, k)))
        rows.append((f"features.{i}.bias", (o,)))
    return rows


def clip_text(width, layers, embed_dim, heads_dim=64):
    rows = [
        ("positional_embedding", (77, width)),
        ("text_projection", (width, embed_dim)),
        ("logit_scale", ()),
        ("token_embedding.weight", (49408, width)),
        ("ln_final.weight", (width,)),
        ("ln_final.bias", (width,)),
    ]
    rows += transformer_blocks("transformer.resblocks", layers, width)
    return rows


def transformer_blocks(prefix, layers, width):
    rows = []
    for i in range(layers):
        p = f"{prefix}.{i}"
        rows += [
            (f"{p}.attn.in_proj_weight", (3 * width, width)),
            (f"{p}.attn.in_proj_bias", (3 * width,)),
            (f"{p}.attn.out_proj.weight", (width, width)),
            (f"{p}.attn.out_proj.bias", (width,)),
            (f"{p}.ln_1.weight", (width,)),
            (f"{p}.ln_1.bias", (width,)),
            (f"{p}.mlp.c_fc.weight", (4 * width, width)),
            (f"{p}.mlp.c_fc.bias", (4 * width,)),
            (f"{p}.mlp.c_proj.weight", (width, 4 * width)),
            (f"{p}.mlp.c_proj.bias", (width,)),
            (f"{p}.ln_2.weight", (width,)),
            (f"{p}.ln_2.bias", (width,)),
        ]
    return rows


def clip_vit_b32():
    w, layers, embed, patch, grid = 768, 12, 512, 32, 7
    rows = [
        ("visual.class_embedding", (w,)),
        ("visual.positional_embedding", (grid * grid + 1, w)),
        ("visual.proj", (w, embed)),
        ("visual.conv1.weight", (w, 3, patch, patch)),
        ("visual.ln_pre.weight", (w,)),
        ("visual.ln_pre.bias", (w,)),
        ("visual.ln_post.weight", (w,)),
        ("visual.ln_post.bias", (w,)),
    ]
    rows += transformer_blocks("visual.transformer.resblocks", layers, w)
    rows += clip_text(512, 12, embed)
    return rows


def bn_keys(prefix, c):
    return [
        (f"{prefix}.weight", (c,)),
        (f"{prefix}.bias", (c,)),
        (f"{prefix}.running_mean", (c,)),
        (f"{prefix}.running_var", (c,)),
        (f"{prefix}.num_batches_tracked", ()),
    ]


def clip_rn50():
    width, layers, embed = 64, (3, 4, 6, 3), 1024
    rows = [
        ("visual.conv1.weight", (width // 2, 3, 3, 3)),
        *bn_keys("visual.bn1", width // 2),
        ("visual.conv2.weight", (width // 2, width // 2, 3, 3)),
        *bn_keys("visual.bn2", width // 2),
        ("visual.conv3.weight", (width, width // 2, 3, 3)),
        *bn_keys("visual.bn3", width),
    ]
    inplanes = width
    for stage in range(4):
        planes = width * (2**stage)
        for bi in range(layers[stage]):
            p = f"visual.layer{stage + 1}.{bi}"
            rows += [(f"{p}.conv1.weight", (planes, inplanes, 1, 1)), *bn_keys(f"{p}.bn1", planes)]
            rows += [(f"{p}.conv2.weight", (planes, planes, 3, 3)), *bn_keys(f"{p}.bn2", planes)]
            rows += [(f"{p}.conv3.weight", (planes * 4, planes, 1, 1)), *bn_keys(f"{p}.bn3", planes * 4)]
            if bi == 0:  # CLIP Bottleneck downsample: OrderedDict("-1" avgpool, "0" conv, "1" bn)
                rows += [(f"{p}.downsample.0.weight", (planes * 4, inplanes, 1, 1))]
                rows += bn_keys(f"{p}.downsample.1", planes * 4)
            inplanes = planes * 4
    c = inplanes  # 2048
    rows += [
        ("visual.attnpool.positional_embedding", (7 * 7 + 1, c)),
        ("visual.attnpool.q_proj.weight", (c, c)),
        ("visual.attnpool.q_proj.bias", (c,)),
        ("visual.attnpool.k_proj.weight", (c, c)),
        ("visual.attnpool.k_proj.bias", (c,)),
        ("visual.attnpool.v_proj.weight", (c, c)),
        ("visual.attnpool.v_proj.bias", (c,)),
        ("visual.attnpool.c_proj.weight", (embed, c)),
        ("visual.attnpool.c_proj.bias", (embed,)),
    ]
    rows += clip_text(512, 12, embed)
    return rows


def vqgan_f16_16384():
    ch, ch_mult, nblocks, z, nemb = 128, (1, 1, 2, 2, 4), 2, 256, 16384

    def gn(prefix, c):
        return [(f"{prefix}.weight", (c,)), (f"{prefix}.bias", (c,))]

    def cv(prefix, o, i, k):
        return [(f"{prefix}.weight", (o, i, k, k)), (f"{prefix}.bias", (o,))]

    def resblock(prefix, cin, cout):
        rows = gn(f"{prefix}.norm1", cin) + cv(f"{prefix}.conv1", cout, cin, 3)
        rows += gn(f"{prefix}.norm2", cout) + cv(f"{prefix}.conv2", cout, cout, 3)
        if cin != cout:
            rows += cv(f"{prefix}.nin_shortcut", cout, cin, 1)
        return rows

    def attnblock(prefix, c):
        rows = gn(f"{prefix}.norm", c)
        for part in ("q", "k", "v", "proj_out"):
            rows += cv(f"{prefix}.{part}", c, c, 1)
        return rows

    rows = cv("encoder.conv_in", ch, 3, 3)
    res, cin = 256, ch
    for lvl, mult in enumerate(ch_mult):
        cout = ch * mult
        for blk in range(nblocks):
            rows += resblock(f"encoder.down.{lvl}.block.{blk}", cin, cout)
            if res == 16:
                rows += attnblock(f"encoder.down.{lvl}.attn.{blk}", cout)
            cin = cout
        if lvl != len(ch_mult) - 1:
            rows += cv(f"encoder.down.{lvl}.downsample.conv", cout, cout, 3)
            res //= 2
    rows += resblock("encoder.mid.block_1", cin, cin)
    rows += attnblock("encoder.mid.attn_1", cin)
    rows += resblock("encoder.mid.block_2", cin, cin)
    rows += gn("encoder.norm_out", cin) + cv("encoder.conv_out", z, cin, 3)

    rows += cv("quant_conv", z, z, 1)
    rows += [("quantize.embedding.weight", (nemb, z))]
    rows += cv("post_quant_conv", z, z, 1)

    block_in = ch * ch_mult[-1]
    rows += cv("decoder.conv_in", block_in, z, 3)
    rows += resblock("decoder.mid.block_1", block_in, block_in)
    rows += attnblock("decoder.mid.attn_1", block_in)
    rows += resblock("decoder.mid.block_2", block_in, block_in)
    res, cin = 16, block_in
    for lvl in reversed(range(len(ch_mult))):
        cout = ch * ch_mult[lvl]
        for blk in range(nblocks + 1):
            rows += resblock(f"decoder.up.{lvl}.block.{blk}", cin, cout)
            if res == 16:
                rows += attnblock(f"decoder.up.{lvl}.attn.{blk}", cout)
            cin = cout
        if lvl != 0:
            rows += cv(f"decoder.up.{lvl}.upsample.conv", cout, cout, 3)
            res *= 2
    rows += gn("decoder.norm_out", cin) + cv("decoder.conv_out", 3, cin, 3)

    # training-only loss subtree sentinels (LPIPS + NLayerDiscriminator);
    # converters must skip the whole loss.* prefix
    rows += [
        ("loss.perceptual_loss.scaling_layer.shift", (1, 3, 1, 1)),
        ("loss.perceptual_loss.scaling_layer.scale", (1, 3, 1, 1)),
        ("loss.perceptual_loss.net.slice1.0.weight", (64, 3, 3, 3)),
        ("loss.perceptual_loss.lin0.model.1.weight", (1, 64, 1, 1)),
        ("loss.discriminator.main.0.weight", (64, 3, 4, 4)),
        ("loss.discriminator.main.0.bias", (64,)),
        ("loss.discriminator.main.2.weight", (128, 64, 4, 4)),
    ]
    return rows


def spynet():
    """sniklaus pytorch-spynet: 6 Basic levels x 5 convs (8->32->64->32->16->2,
    all 7x7), ORIGINAL module* naming as published."""
    dims = [(32, 8), (64, 32), (32, 64), (16, 32), (2, 16)]
    rows = []
    for lvl in range(6):
        for ci, (o, i) in enumerate(dims):
            p = f"moduleBasic.{lvl}.moduleBasic.{ci * 2}"
            rows += [(f"{p}.weight", (o, i, 7, 7)), (f"{p}.bias", (o,))]
    return rows


def pwc():
    """sniklaus pytorch-pwc network-default.pytorch, module* naming.

    Decoder(L) owns the netUpflow/netUpfeat it applies to decoder L+1's
    outputs; registration order inside Decoder is Upflow, Upfeat, One..Six."""
    pyr = [3, 16, 32, 64, 96, 128, 196]
    dense = [128, 128, 96, 64, 32]
    lvl_name = {1: "One", 2: "Two", 3: "Thr", 4: "Fou", 5: "Fiv", 6: "Six"}

    def dec_in(level):
        return 81 if level == 6 else 81 + pyr[level] + 2 + 2

    rows = []
    for lvl in range(1, 7):
        for ci in range(3):
            cin = pyr[lvl - 1] if ci == 0 else pyr[lvl]
            p = f"moduleExtractor.module{lvl_name[lvl]}.{ci * 2}"
            rows += [(f"{p}.weight", (pyr[lvl], cin, 3, 3)), (f"{p}.bias", (pyr[lvl],))]
    for lvl in (2, 3, 4, 5, 6):
        base = f"module{lvl_name[lvl]}"
        if lvl < 6:  # upsamplers for the coarser decoder's outputs (ConvTranspose: in,out,k,k)
            prev_dense = dec_in(lvl + 1) + sum(dense)
            rows += [
                (f"{base}.moduleUpflow.weight", (2, 2, 4, 4)),
                (f"{base}.moduleUpflow.bias", (2,)),
                (f"{base}.moduleUpfeat.weight", (prev_dense, 2, 4, 4)),
                (f"{base}.moduleUpfeat.bias", (2,)),
            ]
        c = dec_in(lvl)
        for ci, dc in enumerate(dense, 1):
            p = f"{base}.module{lvl_name[ci]}.0"
            rows += [(f"{p}.weight", (dc, c, 3, 3)), (f"{p}.bias", (dc,))]
            c += dc
        rows += [
            (f"{base}.moduleSix.0.weight", (2, c, 3, 3)),
            (f"{base}.moduleSix.0.bias", (2,)),
        ]
    c = dec_in(2) + sum(dense)
    for ci, co in enumerate([128, 128, 128, 96, 64, 32, 2]):
        p = f"moduleRefiner.moduleMain.{ci * 2}"
        rows += [(f"{p}.weight", (co, c, 3, 3)), (f"{p}.bias", (co,))]
        c = co
    return rows


def unflow_css_flownetc():
    """FlowNetC (first stage of network-css.pytorch) ordered shape signature.

    Key names are synthesized (``flownetc.N``) — our converter is
    shape-ordered, so order+shapes are the schema; see module docstring."""
    convs = [  # (out, in, k) convs / (in, out, 4) ConvTranspose in registration order
        (64, 3, 7), (128, 64, 5), (256, 128, 5),  # shared tower
        (32, 256, 1),  # conv_redir
        (256, 473, 3),  # conv3_1 (441-ch stride-2 cost volume + 32 redir)
        (512, 256, 3), (512, 512, 3), (512, 512, 3), (512, 512, 3), (1024, 512, 3), (1024, 1024, 3),
        (2, 1024, 3),  # flow6
        ("T", 1024, 512), ("T", 2, 2),  # deconv5, upflow6
        (2, 1026, 3),  # flow5
        ("T", 1026, 256), ("T", 2, 2),  # deconv4, upflow5
        (2, 770, 3),  # flow4
        ("T", 770, 128), ("T", 2, 2),  # deconv3, upflow4
        (2, 386, 3),  # flow3
        ("T", 386, 64), ("T", 2, 2),  # deconv2, upflow3
        (2, 194, 3),  # flow2
    ]
    rows = []
    for n, spec in enumerate(convs):
        if spec[0] == "T":
            _, i, o = spec
            rows += [(f"flownetc.{n}.weight", (i, o, 4, 4)), (f"flownetc.{n}.bias", (o,))]
        else:
            o, i, k = spec
            rows += [(f"flownetc.{n}.weight", (o, i, k, k)), (f"flownetc.{n}.bias", (o,))]
    return rows


SCHEMAS = {
    "vgg19.txt": lambda: vgg_features(VGG19_CH)
    + linear_classifier((1, 4, 6), [(4096, 25088), (4096, 4096), (1000, 4096)]),
    "vgg16.txt": lambda: vgg_features(VGG16_CH)
    + linear_classifier((1, 4, 6), [(4096, 25088), (4096, 4096), (1000, 4096)]),
    "vgg16-sod.txt": lambda: vgg_features(VGG16_CH)
    + linear_classifier((0, 3, 6), [(4096, 25088), (4096, 4096), (100, 4096)]),
    "fcn32s-heavy-pascal.txt": lambda: vgg_features(VGG16_CH)
    + [
        ("classifier.0.weight", (4096, 512, 7, 7)),
        ("classifier.0.bias", (4096,)),
        ("classifier.3.weight", (4096, 4096, 1, 1)),
        ("classifier.3.bias", (4096,)),
    ],
    "nyud-fcn32s-color-heavy.txt": lambda: vgg_features(VGG16_CH)
    + [
        ("classifier.0.weight", (4096, 512, 7, 7)),
        ("classifier.0.bias", (4096,)),
        ("classifier.3.weight", (4096, 4096, 1, 1)),
        ("classifier.3.bias", (4096,)),
    ],
    "vgg16-prune.txt": lambda: vgg_features(VGG16P_CH)
    + linear_classifier((0, 3), [(4096, 25088), (4096, 4096)]),
    "nin_imagenet.txt": nin_features,
    "clip-vit-b-32.txt": clip_vit_b32,
    "clip-rn50.txt": clip_rn50,
    "vqgan_imagenet_f16_16384.txt": vqgan_f16_16384,
    "spynet.txt": spynet,
    "pwc.txt": pwc,
    "unflow-css-flownetc.txt": unflow_css_flownetc,
}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for fname, fn in SCHEMAS.items():
        rows = fn()
        with open(os.path.join(OUT_DIR, fname), "w") as f:
            f.write(f"# key -> shape listing; generated by tools/gen_ckpt_schemas.py (see its docstring for provenance)\n")
            for key, shape in rows:
                f.write(f"{key}\t{','.join(map(str, shape)) if shape else '-'}\n")
        print(f"wrote {fname}: {len(rows)} tensors")


if __name__ == "__main__":
    main()
