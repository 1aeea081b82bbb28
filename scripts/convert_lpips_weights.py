"""Convert torchmetrics/official AlexNet-LPIPS weights to the npz layout
consumed by `i2sdf_tpu.eval.lpips` (run on any machine with download
access; this container is zero-egress).

Usage:
    python scripts/convert_lpips_weights.py [out.npz]

Produces conv{0..4} (HWIO), bias{0..4}, lin{0..4} arrays; drop the file
at i2sdf_tpu/eval/lpips_weights.npz and the framework reports true
LPIPS (it matches torchmetrics to float tolerance — see
tests/test_lpips.py for the formula contract).
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import torch
    from torchmetrics.image.lpip import (
        LearnedPerceptualImagePatchSimilarity as LPIPS)

    metric = LPIPS(net_type="alex", normalize=False)
    net = metric.net.net  # AlexNet feature slices
    convs = [m for m in net.modules()
             if isinstance(m, torch.nn.Conv2d)]
    lins = [lin.model[-1] for lin in metric.net.lins]

    arrays = {}
    for i, conv in enumerate(convs):
        # torch OIHW -> HWIO
        arrays[f"conv{i}"] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0))
        arrays[f"bias{i}"] = conv.bias.detach().numpy()
    for i, lin in enumerate(lins):
        arrays[f"lin{i}"] = np.maximum(
            lin.weight.detach().numpy().reshape(-1), 0.0)
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path}: " + ", ".join(
        f"{k}{v.shape}" for k, v in arrays.items()))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "i2sdf_tpu/eval/lpips_weights.npz")
