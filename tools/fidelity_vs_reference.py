"""Full-scale output-fidelity check against a reference-produced image.

BASELINE.md's north star is SSIM >= 0.98 vs the reference (JCBrouwer/maua-style,
/root/reference/style.py:22-73) at 1024²/500 iters with real VGG-19 weights.
This environment has no pretrained weights, so the comparison can't run here —
this tool *stages* it so it is one command away once weights exist:

1. On any CUDA box, run the reference:
     python style.py --content c.png --style s.png --output_dir ref_out \
         --image_sizes 1024 --num_iters 500 --seed 27
2. Convert the same weights for this repo (see README "Checkpoints"):
     python -m maua_style_tpu.models.convert modelzoo/vgg19.pth modelzoo/vgg19.npz
3. On the TPU box:
     python tools/fidelity_vs_reference.py --reference_output ref_out/c_s_1024.png \
         -- --content c.png --style s.png --output_dir /tmp/fid_out \
            --image_sizes 1024 --num_iters 500 --seed 27

Everything after ``--`` is the standard style CLI arg list (config.py), so any
BASELINE.json config can be checked verbatim.  Prints one JSON line:
``{"ssim": S, "threshold": T, "pass": bool, "ours": path, "reference": path}``
and exits non-zero when S < T.  Exercised at small size with random weights in
tests/test_pipeline_img.py.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--reference_output", required=True, help="image the reference implementation produced")
    ap.add_argument("--threshold", type=float, default=0.98, help="SSIM pass bound (BASELINE.md)")
    if "--" in argv:
        own, style_argv = argv[: argv.index("--")], argv[argv.index("--") + 1 :]
    else:  # tolerate a flat arg list: everything we don't own goes to the style CLI
        own, style_argv = [], []
        it = iter(argv)
        for tok in it:
            (own if tok in ("--reference_output", "--threshold") else style_argv).append(tok)
            if tok in ("--reference_output", "--threshold"):
                own.append(next(it))
    args = ap.parse_args(own)

    from PIL import Image

    from maua_style_tpu import config
    from maua_style_tpu.pipelines.img_img import img_img
    from maua_style_tpu.utils import ssim

    style_args = config.get_args(style_argv)
    assert style_args.transfer_type == "img_img", "fidelity check targets the img_img path"
    if style_args.seed >= 0:  # same seeding as the style CLI entry (style.py main)
        np.random.seed(style_args.seed)
    img_img(style_args)

    ours_path = f"{style_args.output}_{style_args.image_sizes[-1]}.png"
    ours = np.asarray(Image.open(ours_path).convert("RGB"))
    ref = np.asarray(Image.open(args.reference_output).convert("RGB"))
    if ref.shape != ours.shape:
        raise SystemExit(
            f"shape mismatch: ours {ours.shape} vs reference {ref.shape} — "
            "run both with the same --image_sizes/content"
        )
    s = ssim(ours, ref)
    verdict = {
        "ssim": round(s, 6),
        "threshold": args.threshold,
        "pass": bool(s >= args.threshold),
        "ours": ours_path,
        "reference": args.reference_output,
    }
    print(json.dumps(verdict))
    return verdict


if __name__ == "__main__":
    sys.exit(0 if main()["pass"] else 1)
