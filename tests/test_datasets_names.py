"""Dataset name resolution contracts (VERDICT r1 items 3 and 9).

name_to_index must match on the exact extension-stripped basename —
retrieval-table names are extension-stripped (match/localize.py), and on
Replica 'rgb_5' must NOT match rgb_50.png/rgb_55.png (reference compares
exact basenames, utils/dataset.py:307-314). 12-Scenes generated artifacts
use the office->of folder rename (utils/dataset.py:239).
"""
import numpy as np
import pytest

from splatloc_tpu.data.datasets import Scenes12Dataset, _BaseDataset


def _bare_dataset(color_paths):
    ds = object.__new__(_BaseDataset)
    ds.color_paths = color_paths
    return ds


def test_name_to_index_no_substring_collision():
    ds = _bare_dataset([f"/data/room_0/Sequence_1/rgb/rgb_{i}.png"
                        for i in [0, 5, 50, 55, 500]])
    assert ds.name_to_index("rgb_5") == 1
    assert ds.name_to_index("rgb_50") == 2
    assert ds.name_to_index("rgb_500") == 4
    # with extension and with a path prefix, still exact
    assert ds.name_to_index("rgb_55.png") == 3
    assert ds.name_to_index("rgb/rgb_0.png") == 0


def test_name_to_index_missing_raises():
    ds = _bare_dataset(["/d/rgb_1.png", "/d/rgb_2.png"])
    with pytest.raises(AssertionError):
        ds.name_to_index("rgb_3")


def test_scenes12_office_generated_folder(tmp_path):
    scene = tmp_path / "office1" / "gates362"
    data = scene / "data"
    data.mkdir(parents=True)
    (scene / "split.txt").write_text(
        "sequence0 = [frames=3]\nsequence1 = [frames=6]\n")
    for i in range(6):
        (data / f"frame-{i:06d}.color.jpg").write_bytes(b"")
    config = {"Dataset": {"type": "scenes12",
                          "dataset_path": str(scene),
                          "generated_folder": "/gen",
                          "Calibration": {"fx": 100.0, "fy": 100.0,
                                          "cx": 32.0, "cy": 24.0,
                                          "width": 64, "height": 48,
                                          "depth_scale": 1000.0}}}
    ds = Scenes12Dataset(config, train=True)
    assert ds.scene_name == "office1_gates362"
    # reference utils/dataset.py:239: generated artifacts live under of*
    assert ds.generated_folder.endswith("of1_gates362")
    assert "office" not in ds.generated_folder
