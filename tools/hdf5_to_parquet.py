#!/usr/bin/env python
"""Convert an HDF5 benchmark file's datasets to (id, vec) parquet tables.

    python tools/hdf5_to_parquet.py corpus.hdf5 outdir [train test ...]

Uses h5py when installed (any HDF5 file, including chunked/compressed);
otherwise the vendored pure-python classic-format reader, which covers
ann-benchmarks-shaped files (contiguous uncompressed LE numeric
datasets). Each dataset lands at ``outdir/<name>.parquet``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    src, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    try:
        import h5py

        f = h5py.File(src, "r")
        if not names:
            names = sorted(f.keys())
        load = lambda nm: f[nm][()]  # noqa: E731
    except ImportError:
        from jvector_spark.sources.hdf5_lite import (
            list_hdf5,
            read_hdf5_dataset,
        )

        if not names:
            names = sorted(list_hdf5(src))
        load = lambda nm: read_hdf5_dataset(src, nm)  # noqa: E731

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    for nm in names:
        mat = load(nm)
        if mat.ndim == 1:
            mat = mat.reshape(-1, 1)
        pdf = pd.DataFrame({"id": range(len(mat)), "vec": list(mat)})
        dest = os.path.join(outdir, f"{nm}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), dest)
        print(f"{nm}: {mat.shape} {mat.dtype} -> {dest}")


if __name__ == "__main__":
    main()
