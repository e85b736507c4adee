"""In-repo tooling invariants: the sweep sampler must be deterministic and
rotation-independent, and the attestation ledger's round parser must match
the driver's commit conventions."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from verify_local import sample_names  # noqa: E402


def test_sample_names_deterministic_and_rotation_independent():
    names = [f"q{i}" for i in range(100)]
    a = sample_names(names, 10, seed=7)
    b = sample_names(list(reversed(names)), 10, seed=7)  # rotation reorder
    assert a == b  # sorted before shuffle: _PRIORITY order cannot change it
    assert sample_names(names, 10, seed=8) != a  # seed varies the sample
    assert len(set(a)) == 10


def test_ledger_round_parser_handles_multi_boundary_rounds():
    """r3 closed with TWO 'round 3:' commits (snapshot + verdict); the
    parser must assign both to round 3 and the following work to round 4,
    not double-count boundaries."""
    import attestation_ledger as al

    lines = [
        ("a1", "initial"),
        ("a2", "round 1: verdict"),
        ("a3", "feature work"),
        ("a4", "round 2: verdict"),
        ("a5", "round 3: end-of-round snapshot (1 turns)"),
        ("a6", "round 3: verdict"),
        ("a7", "post-r3 work"),
    ]
    # reuse the real parser by monkeypatching its git call
    import subprocess

    real_run = subprocess.run

    def fake_run(cmd, **kw):
        class R:
            stdout = "\n".join(f"{sha} {subj}" for sha, subj in lines)
            returncode = 0
        if cmd[:2] == ["git", "log"] and "--reverse" in cmd:
            return R()
        return real_run(cmd, **kw)

    subprocess.run = fake_run
    try:
        rounds, current = al._commit_rounds()
    finally:
        subprocess.run = real_run
    assert rounds == {"a1": 1, "a2": 1, "a3": 2, "a4": 2,
                      "a5": 3, "a6": 3, "a7": 4}
    assert current == 4
