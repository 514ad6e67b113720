"""Global physical-plan invariants over the ENTIRE queries() surface.

Two anti-patterns kill 100 TB runs no matter how correct the results
are, and both are visible in the formatted plan:

- ``BatchEvalPython`` — a row-at-a-time Python UDF on the hot path
  (the engine's contract is: built-in Column expressions, or
  Arrow-batched ``MapInPandas``/``FlatMapGroupsInPandas`` when Python
  is unavoidable — those appear under their own operator names).
- ``CartesianProduct`` — a non-broadcast cross join that shuffles
  |A|×|B|.  Deliberate cross joins in this engine are
  BroadcastNestedLoopJoin with the small side broadcast, which is a
  different (allowed) operator.

This test sweeps every entry in ``__spark_entry__.queries()`` at
sf0.001 and fails if either string appears in any plan — a regression
guard for the whole surface, so a future operator can't quietly ship a
Python filter or an accidental cartesian.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")


def test_no_row_udfs_or_cartesians_anywhere(spark):
    import __spark_entry__ as entrymod

    offenders: dict[str, list[str]] = {}
    checked = 0
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        hits = [tok for tok in FORBIDDEN if tok in plan]
        if hits:
            offenders[name] = hits
        checked += 1
    assert checked > 130  # the sweep really covered the surface
    assert not offenders, (
        "scale anti-patterns in physical plans: "
        + "; ".join(f"{q}: {h}" for q, h in offenders.items())
    )
