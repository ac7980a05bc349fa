"""Whole-loop trajectory parity (VERDICT r4 missing #2), CPU-sized.

Runs tools/parity_trajectory.py end to end: the reference framework executes 8
full RL train steps in a fresh interpreter (same-weights init, fixed synthetic
batches, per-step rng seeds), our framework replays the identical schedule, and
the per-step losses must track within a tolerance far tighter than the
reference's own 5%-of-magnitude criterion (llm_tests.py:499-503) — fp32 both
sides at depth 1, where the forward parity budget is atol 5e-3 and the loss is
a mean over ~50k elements.

Semantics under test: /root/reference/train/rl_nonadversarial.py:100-198.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/train"), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def trajectory_report(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("traj")
    out = tmp / "PARITY_TRAJ.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # both sides in subprocesses: the reference needs a fresh interpreter, and
    # our side re-reads jax_platforms before touching devices
    subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "parity_trajectory.py"),
            "--tiny", "--f32", "--device", "cpu", "--steps", "8",
            "--batch", "2", "--frames", "4", "--lr", "1e-4",
            "--ref-out", str(tmp / "ref.npz"), "--out", str(out),
        ],
        check=True,
        env=env,
        timeout=1200,
    )
    with open(out) as f:
        return json.load(f)


def test_trajectory_losses_track(trajectory_report):
    r = trajectory_report
    assert len(r["our_losses"]) == 8 and len(r["reference_losses"]) == 8
    # the clean prefix (before any Bernoulli selection flip — the RL
    # objective is chaotic at implementation-noise scale, see the tool's
    # chaos-control) must cover at least 5 of the 8 steps, each within 0.5%
    # — 10x tighter than the reference's 5% criterion; fp32 depth-1 drift
    # measured ~1e-5..1e-4 over 8 Adam steps
    assert r["clean_prefix_steps"] >= 5, r["per_step_rel_diff"]
    assert r["max_rel_in_clean_prefix"] < 5e-3, r["per_step_rel_diff"]
    assert r["pass"] is True


def test_trajectory_stochastic_path_matches(trajectory_report):
    """kept_frame_density / mean_trajectory_prob depend on the sampled
    Bernoulli selections — tracking them (over the clean prefix) proves the
    rng streams stayed aligned across optimizer updates, not just at step 0."""
    aux = trajectory_report["aux_max_rel_diff"]
    assert aux["kept_frame_density"] < 1e-3, aux
    assert aux["mean_trajectory_prob"] < 5e-2, aux  # prob products amplify


def test_trajectory_moves(trajectory_report):
    """Guard against a vacuous pass: the optimizer must actually change the
    model (constant-lr adam, not the near-zero warmup ramp)."""
    ref = trajectory_report["reference_losses"]
    assert ref[0] != ref[-1]
