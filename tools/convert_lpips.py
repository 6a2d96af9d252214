"""Convert torchvision AlexNet features + lpips linear heads to the
splatloc_tpu LPIPS npz layout.

Run wherever torchvision/lpips weights are available:
    python tools/convert_lpips.py weights/lpips_alex.npz
or from already-saved state_dict files (no network needed):
    python tools/convert_lpips.py weights/lpips_alex.npz alex_features.pth lins.pth
"""
import sys

import numpy as np


_CONV_IDX = [0, 3, 6, 8, 10]   # conv layers in torchvision alexnet.features


def convert(alex_features_sd: dict, lin_sd: dict) -> dict:
    """(torchvision alexnet.features state_dict, lpips lin-head state_dict)
    -> splatloc_tpu LPIPS param arrays. Layout proven round-trip in
    tests/test_converters.py against a torch forward with the same
    weights. lin_sd keys follow the lpips package: lin{i}.model.1.weight
    with shape [1, C, 1, 1]."""
    out = {}
    for i, ci in enumerate(_CONV_IDX):
        w = alex_features_sd[f"{ci}.weight"].detach().numpy()
        b = alex_features_sd[f"{ci}.bias"].detach().numpy()
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv{i}_b"] = b
    for i in range(5):
        out[f"lin{i}"] = (lin_sd[f"lin{i}.model.1.weight"]
                          .detach().numpy().reshape(-1))
    return out


def main(dst, alex_src=None, lin_src=None):
    if alex_src is not None:
        import torch
        alex_sd = torch.load(alex_src, map_location="cpu")
        lin_sd = torch.load(lin_src, map_location="cpu")
    else:
        import torchvision
        import lpips as lpips_pkg

        alex_sd = torchvision.models.alexnet(
            weights="IMAGENET1K_V1").features.state_dict()
        net = lpips_pkg.LPIPS(net="alex")
        lin_sd = {f"lin{i}.model.1.weight": lin.model[1].weight
                  for i, lin in enumerate([net.lin0, net.lin1, net.lin2,
                                           net.lin3, net.lin4])}
    out = convert(alex_sd, lin_sd)
    np.savez(dst, **out)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(*sys.argv[1:])
