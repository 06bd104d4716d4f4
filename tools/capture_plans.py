#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/<tag>/.

    python tools/capture_plans.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default suffix
"before"; default query set = every queries() entry). Queries whose
construction itself runs jobs (index builds) pay that cost here — the
captured plan is the final returned DataFrame's plan, which is what the
driver materializes.
"""

from __future__ import annotations

import io
import os
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from jvector_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("jvector_spark_plans")
    qs = entry_mod.queries()
    if not names:
        names = list(qs)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"skip {name}: not declared", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as f:
                f.write(f"# {name} — explain('formatted') @ {sf_dir}\n")
                f.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
        except Exception as e:
            with open(path, "w") as f:
                f.write(f"# {name} FAILED: {e}\n")
                f.write(traceback.format_exc())
            print(f"FAIL {name}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
