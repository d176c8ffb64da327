"""Materialize the golden-oracle JSON files from tools.golden_ref.

Writes ``tests/goldens/{corpus,sf0.001,sf0.01}/<query>.json`` with::

    {"columns": [...], "duck_types": {col: DUCKTYPE}, "rows": [[...]]}

``__spark_entry__.oracle_sql()`` renders these into ``VALUES``
literals for the driver's DuckDB cross-check; the corpus-derived
queries (kg-extract / serialize / media) are scale-independent, the
rest are generated per SF directory.

Run: ``python tools/make_goldens.py`` (Spark-free, ~1 min).
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.golden_ref import CORPUS_QUERIES, DUCK_TYPES, SF_QUERIES  # noqa: E402

GOLDEN_DIR = REPO / "tests" / "goldens"
SF_DIRS = {"sf0.001": "/root/testdata/sf0.001", "sf0.01": "/root/testdata/sf0.01"}


def _write(subdir: str, name: str, columns: list[str], rows: list[tuple]) -> None:
    out = GOLDEN_DIR / subdir
    out.mkdir(parents=True, exist_ok=True)
    payload = {
        "columns": columns,
        "duck_types": DUCK_TYPES[name],
        "rows": [list(r) for r in rows],
    }
    (out / f"{name}.json").write_text(json.dumps(payload, ensure_ascii=False, indent=0))
    print(f"{subdir}/{name}: {len(rows)} rows")


def main() -> None:
    for name, fn in CORPUS_QUERIES.items():
        columns, rows = fn()
        _write("corpus", name, columns, rows)
    for tag, sf_dir in SF_DIRS.items():
        for name, fn in SF_QUERIES.items():
            columns, rows = fn(sf_dir)
            _write(tag, name, columns, rows)


if __name__ == "__main__":
    main()
