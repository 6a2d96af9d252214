"""Convert torchvision AlexNet features + lpips linear heads to the
splatloc_tpu LPIPS npz layout.

Run wherever torchvision/lpips weights are available:
    python tools/convert_lpips.py weights/lpips_alex.npz
"""
import sys

import numpy as np


def main(dst):
    import torch
    import torchvision
    import lpips as lpips_pkg

    alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
    conv_idx = [0, 3, 6, 8, 10]
    out = {}
    for i, ci in enumerate(conv_idx):
        w = alex[ci].weight.detach().numpy()
        b = alex[ci].bias.detach().numpy()
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv{i}_b"] = b

    net = lpips_pkg.LPIPS(net="alex")
    for i, lin in enumerate([net.lin0, net.lin1, net.lin2, net.lin3,
                             net.lin4]):
        out[f"lin{i}"] = lin.model[1].weight.detach().numpy().reshape(-1)
    np.savez(dst, **out)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1])
