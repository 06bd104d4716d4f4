#!/usr/bin/env python
"""Capture the physical plan of the DataFrame the training-set sampler
actually collects (the JVM->driver fetch), before/after the r9 rewrite.

    python tools/capture_sample_plan.py plans/r09/build_sample_fetch_after.txt

Monkeypatches DataFrame.toPandas to record .explain("formatted") of every
frame the sampler collects, then runs sample_and_count on the sf0.01
embeddings table with the bench-default cap (so the captured plan is the
one the 100k builds execute).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from jvector_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("jvs_sample_plan")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("embedding").alias("vec")
    )

    plans: list[str] = []
    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame, which
    # OVERRIDES toPandas — patch the concrete class, not the base.
    cls = type(emb)
    orig = cls.toPandas

    def spy(self):
        buf = io.StringIO()
        with redirect_stdout(buf):
            self.explain("formatted")
        plans.append(buf.getvalue())
        return orig(self)

    cls.toPandas = spy
    try:
        from jvector_spark.operators.sample import sample_and_count

        n, samp = sample_and_count(emb, sample_cap=128, seed=7)
    finally:
        cls.toPandas = orig

    with open(out_path, "w") as f:
        f.write(
            f"# training-sample fetch plan(s) @ {sf_dir} "
            f"(n={n}, sample={samp.shape})\n"
        )
        for i, p in enumerate(plans):
            f.write(f"\n## collected frame {i}\n{p}")
    print(f"wrote {out_path} ({len(plans)} plan(s))", file=sys.stderr)


if __name__ == "__main__":
    main()
