#!/usr/bin/env python
"""Generate the real-PDF golden parquets for the real_* oracle queries.

The generating chain is itself pinned byte-exact to the reference's own
fixtures (tests/test_real_pdf.py: scotus layout text vs
comparisons/scotus-transcript-p1.txt, ca-warn 364/46 edge + 304
intersection invariants, nics 700/508 edges), so these goldens are
anchored to the reference, not self-referential.

Usage: python scripts/gen_real_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> int:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E
    import pyarrow.parquet as pq

    os.makedirs(E._REAL_GOLDEN_DIR, exist_ok=True)
    for name, fn in (
        ("real_layout_text", E.q_real_layout_text),
        ("real_objects", E.q_real_objects),
        ("real_structure", E.q_real_structure),
        ("real_rotation_text", E.q_real_rotation_text),
        ("real_tables", E.q_real_tables),
        ("vertical_text", E.q_vertical_text),
        ("page_images", E.q_page_images),
        ("real_repair", E.q_real_repair),
        ("real_laparams", E.q_real_laparams),
        ("real_words", E.q_real_words),
    ):
        import pyarrow as pa
        refs = ray.get(fn("/root/testdata/sf0.001").to_arrow_refs())
        tbl = pa.concat_tables([r for r in refs if r.num_rows], promote_options="default")
        path = os.path.join(E._REAL_GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
