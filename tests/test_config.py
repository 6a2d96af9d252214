"""Config loader: golden merged dicts over every shipped config plus
merge/inheritance unit semantics.

The golden fixture (tests/golden/config_merge.json) was captured from the
semantics of the reference's loader (utils/config_utils.py:4-50) over all
22 shipped configs, so the reimplemented pure-functional merge is pinned
to consume the same YAML schema identically.
"""
import glob
import json
import os

import pytest
import yaml

from splatloc_tpu.cli.config import load_config, merge_configs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden", "config_merge.json")


def test_golden_merge_all_shipped_configs():
    with open(GOLDEN) as f:
        golden = json.load(f)
    cwd = os.getcwd()
    try:
        os.chdir(REPO)  # inherit_from paths are repo-relative
        paths = sorted(glob.glob("configs/**/*.yaml", recursive=True))
        assert len(paths) >= 21 and set(paths) == set(golden)
        for p in paths:
            assert load_config(p) == golden[p], p
    finally:
        os.chdir(cwd)


def test_merge_is_pure_and_deep():
    base = {"a": {"x": 1, "y": 2}, "b": 3, "keep": {"z": 9}}
    override = {"a": {"y": 20, "w": 30}, "b": {"now": "dict"}, "c": 4}
    merged = merge_configs(base, override)
    assert merged == {"a": {"x": 1, "y": 20, "w": 30},
                      "b": {"now": "dict"}, "c": 4, "keep": {"z": 9}}
    # inputs untouched
    assert base == {"a": {"x": 1, "y": 2}, "b": 3, "keep": {"z": 9}}
    assert override == {"a": {"y": 20, "w": 30}, "b": {"now": "dict"},
                        "c": 4}
    # merged subtrees are fresh dicts, not mutated views of the base
    assert merged["a"] is not base["a"]


def test_inherit_chain_and_default(tmp_path):
    (tmp_path / "root.yaml").write_text("A: {x: 1, y: 1}\nB: 1\n")
    (tmp_path / "mid.yaml").write_text(
        f"inherit_from: {tmp_path / 'root.yaml'}\nA: {{y: 2}}\nC: 2\n")
    (tmp_path / "leaf.yaml").write_text(
        f"inherit_from: {tmp_path / 'mid.yaml'}\nA: {{z: 3}}\n")
    cfg = load_config(str(tmp_path / "leaf.yaml"))
    assert cfg["A"] == {"x": 1, "y": 2, "z": 3}
    assert cfg["B"] == 1 and cfg["C"] == 2
    # default_path seeds below the chain root
    (tmp_path / "default.yaml").write_text("D: 42\nB: 0\n")
    cfg = load_config(str(tmp_path / "leaf.yaml"),
                      str(tmp_path / "default.yaml"))
    assert cfg["D"] == 42 and cfg["B"] == 1


def test_inherit_relative_to_including_file(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "base.yaml").write_text("V: 7\n")
    (sub / "leaf.yaml").write_text("inherit_from: base.yaml\nW: 8\n")
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)  # 'base.yaml' does not exist in cwd
        cfg = load_config(str(sub / "leaf.yaml"))
    finally:
        os.chdir(cwd)
    assert cfg == {"inherit_from": "base.yaml", "V": 7, "W": 8}


def test_inherit_cycle_rejected(tmp_path):
    (tmp_path / "a.yaml").write_text(
        f"inherit_from: {tmp_path / 'b.yaml'}\n")
    (tmp_path / "b.yaml").write_text(
        f"inherit_from: {tmp_path / 'a.yaml'}\n")
    with pytest.raises(ValueError, match="cycle"):
        load_config(str(tmp_path / "a.yaml"))
