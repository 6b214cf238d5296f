"""Oracle-validity preconditions, wired into the suite (ADVICE r5).

Several hash oracles are only valid under DATA-dependent preconditions:
the LSH/IVF/SemDeDup float-vs-SQL twins need every decision (sign bit,
argmax, threshold crossing) to clear float accumulation error by orders
of magnitude; the Misra-Gries exact-top-5 twin needs the candidate set
complete (distinct keys within capacity); the MinHash all-pairs twin
needs every true pair strong enough that 4-band/2-row banding catches it.

A driver-side testdata regeneration can silently break any of these —
and the resulting driver hash red would look exactly like an operator
bug. This test runs ``tools.margin_audit.audit`` against the SFs the
suite and the driver actually use, so an oracle-validity break fails
HERE, loudly, as a precondition message instead.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.margin_audit import audit  # noqa: E402

#: sf0.001 is the local parity suite's SF; sf0.01 is the driver's pinned
#: correctness-gate SF. sf0.1 (bench-only, no hash compare) is covered by
#: the standalone ``python tools/margin_audit.py`` run at round close.
_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_oracle_preconditions_hold(sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    broken = [
        f"{op}: {what} = {margin:.3e}"
        for op, what, margin, ok in audit(sf_dir)
        if not ok
    ]
    assert not broken, (
        "ORACLE PRECONDITION VIOLATED at %s — a driver hash mismatch on "
        "these ops would be an oracle-validity break, NOT an engine bug; "
        "re-derive the oracle for the regenerated data before debugging "
        "the operator:\n  %s" % (sf_dir, "\n  ".join(broken))
    )
