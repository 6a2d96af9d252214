"""Opt-in full-scale quality gate (VERDICT r1 item 5).

Runs the reference-scale synthetic reconstruction protocol — 640x480, 36
keyframes, >=100k Gaussians through real densify/prune/opacity-reset cycles
— and asserts the reconstruction quality bars. Slow (many minutes) and meant
for the real TPU chip, so it only runs when explicitly requested:

    SPLATLOC_QUALITY_GATE=1 python -m pytest tests/test_quality_gate.py -s
"""
import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPLATLOC_QUALITY_GATE"),
    reason="full-scale gate: set SPLATLOC_QUALITY_GATE=1 (slow; TPU-scale)")


def test_full_scale_reconstruction_quality():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import quality_gate

    res = quality_gate.main()
    assert res["psnr"] >= 30.0, res
    assert res["ssim"] >= 0.85, res
    assert res["kp_contrast"] >= 5.0, res
    assert res["n_alive"] >= 100_000, res
    assert res["n_dropped_total"] == 0, res
