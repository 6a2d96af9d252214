"""Convert the hloc NetVLAD (Pitts30k VGG16) checkpoint to the splatloc_tpu
npz layout.

Run wherever the hloc third-party checkpoint is available (hloc downloads
VGG16_NetVLAD.mat or the torch port):
    python tools/convert_netvlad.py <checkpoint> weights/netvlad.npz

Expects a torch state dict with hloc's NetVLAD naming
(backbone.N.weight / score_proj / center / whiten).
"""
import sys

import numpy as np
import torch

_VGG_ORDER = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
              "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
              "conv5_1", "conv5_2", "conv5_3"]


def convert(sd: dict) -> dict:
    """hloc NetVLAD state_dict -> splatloc_tpu param arrays. Layout proven
    round-trip in tests/test_converters.py against a torch forward with the
    same weights."""
    out = {}
    conv_keys = [k for k in sd if k.endswith(".weight") and sd[k].dim() == 4
                 and "backbone" in k]
    conv_keys = sorted(conv_keys, key=lambda k: int(k.split(".")[1]))
    assert len(conv_keys) >= len(_VGG_ORDER), conv_keys
    for name, k in zip(_VGG_ORDER, conv_keys):
        out[f"{name}_w"] = np.transpose(sd[k].detach().numpy(), (2, 3, 1, 0))
        out[f"{name}_b"] = sd[k.replace(".weight", ".bias")].detach().numpy()
    out["vlad_assign_w"] = np.transpose(
        sd["netvlad.score_proj.weight"].detach().numpy(), (2, 3, 1, 0))
    out["vlad_assign_b"] = sd.get(
        "netvlad.score_proj.bias",
        torch.zeros(out["vlad_assign_w"].shape[-1])).detach().numpy()
    out["vlad_centers"] = sd["netvlad.centers"].detach().numpy().T
    if "whiten.weight" in sd:
        out["whiten_w"] = sd["whiten.weight"].detach().numpy().T
        out["whiten_b"] = sd["whiten.bias"].detach().numpy()
    return out


def main(src, dst):
    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = convert(sd)
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
