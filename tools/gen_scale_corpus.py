"""Synthesize an N× replica corpus from a testdata sf directory — the
measurement substrate for PERF.md's scaling table (VERDICT r6/r7: the
100 TB claim needs numbers above sf0.1, not just plan shapes).

Replication is NOT naive row copying: identical text repeated N times
would weld every replica into one giant near-duplicate cluster, turning
the banded-LSH pair relation ~quadratic in N — a corpus that is 10×
bigger does NOT have 45× the duplicate pairs.  Instead each replica is
a deterministic "dialect" of the original:

  * documents — replica i>0 suffixes every 3rd word with the replica id
    (``word`` → ``word~i``).  The transform is applied uniformly inside
    a replica, so WITHIN-replica similarity structure (the thing the
    dedup/textsim operators measure) is preserved exactly, while ~1/3
    of words differ across replicas — enough that any word-shingle of
    length >= 2 straddles a change with high probability and
    cross-replica Jaccard collapses.  doc_id shifts by a replica
    offset; n_chars is recomputed from the transformed text.
  * embeddings — replica i rolls each vector's dimensions by i
    (a fixed permutation: within-replica cosines are IDENTICAL to the
    original, cross-replica alignment is scrambled).  vec_id shifts.
  * events — user_id/event_id shift per replica, timestamps stay in the
    original range: N× concurrent users over the same wall-clock window,
    which is how event volume actually grows.  Per-user session
    structure is byte-identical to the original replica.
  * lineitem/orders/customer — orderkey/custkey shift by consistent
    offsets so FK joins stay 1:1 valid; part/supplier keys keep the
    original domain (N× lines per part = popularity growth).
  * nation/region/part/supplier — copied verbatim (dimensions do not
    scale with fact volume).

Everything is pyarrow-native (no pandas round-trip), preserving the
source parquet logical types — notably events' TIMESTAMP(NANOS), which
the engine's read path special-cases and must still see at scale.

``--skew`` (VERDICT r8 task 3) produces the SAME total volume with a
zipf-head key distribution — the scale risk SURVEY §7.3 names (frequent
paths `have`/`be in` dominating groups) that uniform replication cannot
exhibit:

  * events — ~50% of all events (selected by a Knuth-hash of event_id,
    so the choice is deterministic and replica-independent) are remapped
    onto 8 globally-hot users: at 10× that is ~62k events per hot user
    vs ~67 for the uniform tail (~900× average) — the straggler shape
    for sessionize windows and per-user aggregation;
  * documents — every 7th word position becomes one of 4 globally-hot
    tokens (``zz0``-``zz3``, document frequency ≈ corpus size — the
    `have`/`the` analogue) ON TOP of the per-replica dialect suffix, so
    cross-replica texts stay distinct (no welded duplicate clusters)
    while shingle/band/df hot keys appear;
  * lineitem — ~30% of lines (same deterministic hash selection) remap
    l_partkey to hot key 0: at 10× that is ~1.8M lines on one part
    (~60,000× average) — the salted-join / AQE-skew-split stressor.
    The key stays inside the part domain, so FK joins remain valid.

Run:  python tools/gen_scale_corpus.py [--mult 10] [--src /root/testdata/sf0.1]
          [--out /tmp/dhs_scale] [--skew]
Writes <out>/x<mult>[skew]/<table>.parquet and prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES_VERBATIM = ("nation", "region", "part", "supplier")


def _shift_col(t: pa.Table, col: str, off: int) -> pa.Table:
    i = t.schema.get_field_index(col)
    arr = pa.array(t.column(col).to_numpy(zero_copy_only=False) + off,
                   type=t.schema.field(col).type)
    return t.set_column(i, t.schema.field(col), arr)


def _replicate(src: str, out: str, table: str, mult: int,
               key_offsets: dict[str, int],
               transform=None) -> int:
    """Write ``mult`` replicas as successive row groups through ONE
    ParquetWriter — memory stays O(one replica) no matter the
    multiplier, so 100x runs don't need 100x RAM."""
    t0 = pq.read_table(f"{src}/{table}.parquet")
    rows = 0
    with pq.ParquetWriter(f"{out}/{table}.parquet", t0.schema) as w:
        for i in range(mult):
            t = t0
            for col, base in key_offsets.items():
                if i:
                    t = _shift_col(t, col, i * base)
            if transform is not None:
                t = transform(t, i)
            w.write_table(t)
            rows += t.num_rows
    return rows


def _doc_transform(t: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return t
    texts = t.column("text").to_pylist()
    new_texts = []
    for s in texts:
        words = s.split(" ")
        for j in range(0, len(words), 3):
            words[j] = f"{words[j]}~{i}"
        new_texts.append(" ".join(words))
    sch = t.schema
    t = t.set_column(sch.get_field_index("text"), sch.field("text"),
                     pa.array(new_texts, type=sch.field("text").type))
    t = t.set_column(sch.get_field_index("n_chars"), sch.field("n_chars"),
                     pa.array([len(s) for s in new_texts],
                              type=sch.field("n_chars").type))
    return t


_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(2**32)


def _hash_pct(ids: np.ndarray) -> np.ndarray:
    """Deterministic 0-99 bucket per id (Knuth multiplicative hash) —
    the replica-independent coin for skew-subset selection."""
    return ((ids.astype(np.uint64) * _KNUTH) % _M32) % np.uint64(100)


def _skew_events(t: pa.Table, i: int) -> pa.Table:
    """~50% of events onto 8 globally-hot users, volume unchanged."""
    ev = t.column("event_id").to_numpy(zero_copy_only=False)
    uid = t.column("user_id").to_numpy(zero_copy_only=False).copy()
    mask = _hash_pct(ev) < 50
    uid[mask] = ev[mask] % 8
    idx = t.schema.get_field_index("user_id")
    return t.set_column(idx, t.schema.field("user_id"),
                        pa.array(uid, type=t.schema.field("user_id").type))


def _skew_lineitem(t: pa.Table, i: int) -> pa.Table:
    """~30% of lines onto hot part key 0, volume unchanged."""
    ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
    ln = t.column("l_linenumber").to_numpy(zero_copy_only=False)
    lpk = t.column("l_partkey").to_numpy(zero_copy_only=False).copy()
    mask = _hash_pct(ok.astype(np.uint64) * np.uint64(7) +
                     ln.astype(np.uint64)) < 30
    lpk[mask] = 0
    idx = t.schema.get_field_index("l_partkey")
    return t.set_column(idx, t.schema.field("l_partkey"),
                        pa.array(lpk, type=t.schema.field("l_partkey").type))


def _skew_doc_transform(t: pa.Table, i: int) -> pa.Table:
    """Dialect suffix (cross-replica distinctness preserved) + hot-token
    injection at every 7th word position (global df ≈ corpus size)."""
    texts = t.column("text").to_pylist()
    new_texts = []
    for s in texts:
        words = s.split(" ")
        if i:
            for j in range(0, len(words), 3):
                words[j] = f"{words[j]}~{i}"
        for j in range(1, len(words), 7):
            words[j] = f"zz{(j // 7) % 4}"
        new_texts.append(" ".join(words))
    sch = t.schema
    t = t.set_column(sch.get_field_index("text"), sch.field("text"),
                     pa.array(new_texts, type=sch.field("text").type))
    t = t.set_column(sch.get_field_index("n_chars"), sch.field("n_chars"),
                     pa.array([len(s) for s in new_texts],
                              type=sch.field("n_chars").type))
    return t


def _emb_transform(t: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return t
    col = t.column("embedding")
    flat = col.combine_chunks()
    vecs = [np.roll(v, i).tolist() if v is not None else None
            for v in flat.to_pylist()]
    sch = t.schema
    return t.set_column(sch.get_field_index("embedding"),
                        sch.field("embedding"),
                        pa.array(vecs, type=sch.field("embedding").type))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/dhs_scale")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (default: all); dims "
                         "are always copied so loads never 404")
    ap.add_argument("--skew", action="store_true",
                    help="zipf-head key skew at constant volume "
                         "(hot users/tokens/part keys — see module doc)")
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    out = os.path.join(args.out, f"x{args.mult}{'skew' if args.skew else ''}")
    os.makedirs(out, exist_ok=True)
    t_start = time.perf_counter()

    def key_max(table: str, col: str) -> int:
        return int(pc.max(
            pq.read_table(f"{args.src}/{table}.parquet", columns=[col])
            .column(col)).as_py()) + 1

    doc_off = key_max("documents", "doc_id")
    vec_off = key_max("embeddings", "vec_id")
    evt_off = key_max("events", "event_id")
    usr_off = key_max("events", "user_id")
    ord_off = key_max("orders", "o_orderkey")
    cust_off = key_max("customer", "c_custkey")

    plans = {
        "documents": ({"doc_id": doc_off},
                      _skew_doc_transform if args.skew else _doc_transform),
        "embeddings": ({"vec_id": vec_off}, _emb_transform),
        "events": ({"event_id": evt_off, "user_id": usr_off},
                   _skew_events if args.skew else None),
        "lineitem": ({"l_orderkey": ord_off},
                     _skew_lineitem if args.skew else None),
        "orders": ({"o_orderkey": ord_off, "o_custkey": cust_off}, None),
        "customer": ({"c_custkey": cust_off}, None),
    }
    rows = {}
    for tab, (offs, tf) in plans.items():
        if only is not None and tab not in only:
            continue
        rows[tab] = _replicate(args.src, out, tab, args.mult, offs, tf)
    for tab in TABLES_VERBATIM:
        t = pq.read_table(f"{args.src}/{tab}.parquet")
        pq.write_table(t, f"{out}/{tab}.parquet")
        rows[tab] = t.num_rows

    print(json.dumps({
        "out": out, "mult": args.mult, "src": args.src,
        "skew": bool(args.skew), "rows": rows,
        "gen_seconds": round(time.perf_counter() - t_start, 3),
    }))


if __name__ == "__main__":
    main()
