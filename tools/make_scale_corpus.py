"""Build a 10x scale corpus (sf1.0-shaped) from the sf0.1 fixtures for
SCALING evidence runs (VERDICT r5 item 3).

Replicates each fact table R times with FOREIGN-KEY-CONSISTENT offsets:
every key domain (custkey, orderkey, partkey, suppkey, event/user ids,
doc ids, vec ids) is shifted by ``replica * (max_key + 1)`` in every
table that references it, so join selectivities and per-key densities
match the original — the corpus is 10x the rows with the same shape,
which is exactly what a scaling measurement needs. Dimension tables
(region, nation) keep their real-world cardinality.

pyarrow end-to-end so column dtypes (including the events ts physical
type) survive byte-exactly. Output is NOT an oracle fixture — the
driver's correctness corpus stays /root/testdata; this exists only for
``tools/bench_scale.py``.

Round 8 options (VERDICT r7 item 2 — the synthetic corpus has NO skew
growth: max shingle df stays 25 at every scale because the decorrelation
tag makes replica vocabularies disjoint, so the sqrt stop-shingle cap
never fires above its 1,000-doc unit fixture):

``--boilerplate-every N``  append one fixed UNTAGGED 12-word template
    sentence to every N-th document of every replica — a license-header
    / navigation-chrome model whose 10 shared 3-grams reach document
    frequency (n_docs / N), GROWING with the corpus. N=21 puts the
    planted df between the sqrt threshold and the fractional threshold
    at both 10x (2,390 vs sqrt 2,236 / frac 2,500) and 100x (23,900 vs
    sqrt 7,071 / frac 25,000): the r7 sqrt term is the ONLY thing that
    drops it.
``--only t1,t2``  write just those tables (the planted text corpus only
    needs documents.parquet).

Usage: python tools/make_scale_corpus.py [replicas] [out_dir]
           [--boilerplate-every N] [--only tables]
"""
from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")

# table -> {column: key_domain}; every domain member shifts together
_KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
_DIMS = ["region", "nation"]


def _domain_extents(tables: dict[str, pa.Table]) -> dict[str, int]:
    extent: dict[str, int] = {}
    for tname, cols in _KEYED.items():
        for col, dom in cols.items():
            mx = pc.max(tables[tname][col]).as_py()
            extent[dom] = max(extent.get(dom, 0), int(mx) + 1)
    return extent


# One fixed template sentence (12 words -> 10 three-gram shingles), the
# license-header / navigation-chrome model. NEVER replica-tagged: its
# shingles must be shared ACROSS replicas so their df grows with the
# corpus — the skew class the sqrt stop-shingle cap exists for.
BOILERPLATE = ("this document is provided under the standard public "
               "corpus license terms reserved")


def _plant_boilerplate(tbl: pa.Table, every: int) -> pa.Table:
    idx = tbl.schema.get_field_index("text")
    texts = [
        None if t is None else (t + " " + BOILERPLATE if i % every == 0
                                else t)
        for i, t in enumerate(tbl["text"].to_pylist())
    ]
    return tbl.set_column(idx, tbl.schema.field(idx),
                          pa.array(texts, type=tbl.schema.field(idx).type))


def build(replicas: int, out_dir: Path, boilerplate_every: int = 0,
          only: set[str] | None = None) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    keyed = {t: c for t, c in _KEYED.items() if only is None or t in only}
    dims = [t for t in _DIMS if only is None or t in only]
    tables = {t: pq.read_table(SRC / f"{t}.parquet")
              for t in list(_KEYED) + _DIMS}  # extents need ALL tables
    extent = _domain_extents(tables)

    for t in dims:
        pq.write_table(tables[t], out_dir / f"{t}.parquet")
    for tname, cols in keyed.items():
        base = tables[tname]
        chunks = []
        for r in range(replicas):
            tbl = base
            if r:
                for col, dom in cols.items():
                    idx = tbl.schema.get_field_index(col)
                    shifted = pc.add(
                        tbl[col], pa.scalar(r * extent[dom],
                                            type=tbl.schema.field(idx).type)
                    )
                    tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted)
                tbl = _decorrelate(tname, tbl, r)
            if (boilerplate_every and tname == "documents"
                    and "text" in tbl.column_names):
                tbl = _plant_boilerplate(tbl, boilerplate_every)
            chunks.append(tbl)
        out = pa.concat_tables(chunks)
        # >=32 row groups per fact table (capped at pyarrow's 1Mi-row
        # default): a single-row-group file cannot split, so every
        # scan and map-only stage before the first exchange runs in
        # ONE task — the round-6 smoke found embeddings/documents
        # written as one 200k/500k-row group, serializing the whole
        # text/embedding family's first stage on one core and
        # masking real scan parallelism in the 100x measurements.
        rg = max(1024, min(out.num_rows // 32 + 1, 1 << 20))
        pq.write_table(out, out_dir / f"{tname}.parquet", row_group_size=rg)
        print(f"{tname}: {base.num_rows} -> {base.num_rows * replicas} rows "
              f"({rg} rows/group)")


def _decorrelate(tname: str, tbl: pa.Table, r: int) -> pa.Table:
    """Replicating text/vectors VERBATIM makes every row a near-dup of
    its clones, inflating similarity-join output ~quadratically in the
    replica count — a corpus artifact a real 10x corpus (more DISTINCT
    docs) doesn't have. Decorrelate clones: suffix every word with the
    replica tag (shingle sets become disjoint across replicas while
    word counts / lengths keep their distribution) and shift embedding
    coordinates by a deterministic per-replica pattern."""
    if tname == "part" and "p_name" in tbl.column_names:
        # Same clone-density artifact as documents, via entity names:
        # TPC-H p_name draws 5 words from a ~92-color vocabulary, so
        # verbatim replicas multiply every name-blocked ER block by
        # the replica count and the within-block pair space by its
        # square (the sf10 smoke measured part_name_blocked_pairs at
        # 10,000x work). A real 100x catalog has ~100x more DISTINCT
        # entities; tag name words per replica to model that.
        idx = tbl.schema.get_field_index("p_name")
        tag = f"·r{r}"
        names = [
            None if t is None else " ".join(w + tag for w in t.split(" "))
            for t in tbl["p_name"].to_pylist()
        ]
        tbl = tbl.set_column(idx, tbl.schema.field(idx),
                             pa.array(names, type=tbl.schema.field(idx).type))
    if tname == "documents" and "text" in tbl.column_names:
        idx = tbl.schema.get_field_index("text")
        tag = f"·r{r}"  # one token-internal suffix, no new words
        texts = [
            None if t is None else " ".join(w + tag for w in t.split(" "))
            for t in tbl["text"].to_pylist()
        ]
        tbl = tbl.set_column(idx, tbl.schema.field(idx),
                             pa.array(texts, type=tbl.schema.field(idx).type))
    if tname == "embeddings" and "embedding" in tbl.column_names:
        idx = tbl.schema.get_field_index("embedding")
        field = tbl.schema.field(idx)
        vecs = tbl["embedding"].to_pylist()
        out = []
        for row_no, v in enumerate(vecs):
            if v is None:
                out.append(None)
                continue
            out.append([
                x + (((r * 31 + row_no * 7 + i) % 11) - 5) * 0.03
                for i, x in enumerate(v)
            ])
        tbl = tbl.set_column(idx, field, pa.array(out, type=field.type))
    return tbl


if __name__ == "__main__":
    args = sys.argv[1:]
    bp = 0
    only = None
    if "--boilerplate-every" in args:
        i = args.index("--boilerplate-every")
        bp = int(args[i + 1])
        del args[i:i + 2]
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    replicas = int(args[0]) if args else 10
    out = Path(args[1]) if len(args) > 1 else Path("/tmp/sfscale/sf1.0")
    build(replicas, out, boilerplate_every=bp, only=only)
    print("wrote", out)
