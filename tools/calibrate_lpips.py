"""One-command LPIPS calibration: convert torch checkpoints into the npz
artifacts ``load_lpips`` picks up automatically.

The VGG16/AlexNet trunks (~528 MB / ~233 MB, torchvision pretrained) are not
shipped and this environment has no egress; on any machine WITH egress:

    pip install torch torchvision lpips
    python - <<'PY'
    import torch, torchvision
    torch.save(torchvision.models.vgg16(weights='DEFAULT').state_dict(), 'vgg16.pth')
    torch.save(torchvision.models.alexnet(weights='DEFAULT').state_dict(), 'alexnet.pth')
    import lpips, os, shutil
    shutil.copy(os.path.join(os.path.dirname(lpips.__file__), 'weights/v0.1/alex.pth'), 'alex_heads.pth')
    PY

then copy the files here and run:

    python tools/calibrate_lpips.py --vgg16 vgg16.pth --vgg_heads <ref>/utils/lpips/weights/v0.1/vgg.pth
    python tools/calibrate_lpips.py --alexnet alexnet.pth --alex_heads alex_heads.pth

Outputs ``gomavatar_tpu/weights/lpips_{vgg,alex}.npz``; training, eval and
bench then report ``lpips`` as CALIBRATED (values comparable to published
numbers).  The conversion math is golden-tested against torch forwards in
tests/test_losses_metrics.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gomavatar_tpu.models import lpips as lpips_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg16", help="torchvision vgg16 state_dict .pth")
    ap.add_argument("--vgg_heads", help="reference utils/lpips/weights/v0.1/vgg.pth")
    ap.add_argument("--alexnet", help="torchvision alexnet state_dict .pth")
    ap.add_argument("--alex_heads", help="lpips package weights/v0.1/alex.pth")
    ap.add_argument("--out_dir", default=lpips_lib.WEIGHTS_DIR)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    wrote = []

    if args.vgg16:
        params, calibrated = lpips_lib.load_torch_vgg16(args.vgg16, args.vgg_heads)
        out = os.path.join(args.out_dir, "lpips_vgg.npz")
        lpips_lib.save_npz(out, params)
        wrote.append((out, calibrated))
    elif args.vgg_heads:
        # heads-only conversion (the 7 KB file the reference ships)
        import numpy as np

        heads = lpips_lib.load_torch_heads(args.vgg_heads)
        out = os.path.join(args.out_dir, "lpips_vgg_heads.npz")
        np.savez(out, **{f"head_{i}": h for i, h in enumerate(heads)})
        wrote.append((out, False))

    if args.alexnet:
        params, calibrated = lpips_lib.load_torch_alexnet(args.alexnet, args.alex_heads)
        out = os.path.join(args.out_dir, "lpips_alex.npz")
        lpips_lib.save_npz(out, params)
        wrote.append((out, calibrated))

    if not wrote:
        ap.error("nothing to convert: pass --vgg16/--vgg_heads/--alexnet")
    for path, calibrated in wrote:
        print(f"wrote {path} (calibrated={calibrated})")
        _, cal, status = lpips_lib.load_lpips(
            "alex" if "alex" in os.path.basename(path) else "vgg",
            weights_dir=args.out_dir, quiet=True,
        )
        print(f"  load_lpips now reports: {status}")


if __name__ == "__main__":
    main()
