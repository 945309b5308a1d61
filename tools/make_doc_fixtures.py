"""Regenerate the committed PDF/DOCX fixtures in ``tests/fixtures/``.

The builders live in ``dynamic_etl_pipeline_spark.ingest.docgen`` (stdlib
only, byte-deterministic); this script just writes them to disk.  Run:
``python tools/make_doc_fixtures.py``.
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from dynamic_etl_pipeline_spark.ingest.docgen import (
    EXPECTED_DOCX_PARAGRAPHS,  # noqa: F401  (re-export for older imports)
    EXPECTED_PAGES,  # noqa: F401
    build_classic_pdf,
    build_docx,
    build_objstm_pdf,
)

FIX = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def main() -> None:
    FIX.mkdir(parents=True, exist_ok=True)
    (FIX / "sample_classic.pdf").write_bytes(build_classic_pdf())
    (FIX / "sample_objstm.pdf").write_bytes(build_objstm_pdf())
    (FIX / "sample.docx").write_bytes(build_docx())
    print("wrote", sorted(p.name for p in FIX.glob("sample*")))


if __name__ == "__main__":
    main()
