#!/usr/bin/env python
"""Generate the sf0.5-equivalent stress slice (r12 verdict item 3).

Upsamples the sf0.1 documents/embeddings/customer tables 5x into
``--out`` (default /tmp/sf0.5) for Spark-side-only linearity timings —
never committed, never read by the driver.  Design constraints that
make "5x data" faithful rather than degenerate:

* **id offsets** are multiples of 36,036,000 (divisible by
  lcm(1..13)=360,360 and by 40/50/100), so every ``id % k`` planted-
  structure arithmetic in the registered queries (sampling moduli 5/7/
  10/11, near-dup offsets +100000/+200000, the %40 dhash seed, the %50
  query subset) replicates EXACTLY once per copy — work scales 5x, not
  quadratically via cross-copy plants.
* **documents**: copy k>0 suffixes every token with ``k{k}`` — a real
  5x corpus brings new vocabulary, so gram/token bucket DEPTH stays
  constant while bucket COUNT scales.  (First attempt permuted word
  order instead; the 31-token synthetic vocabulary then made every
  gram bucket 5x deeper and the exact-Jaccard verification side went
  quadratic on CROSS-copy candidates — a data artifact, not an
  operator property.)
* **embeddings**: copy k rolls vector components by k — norms and
  within-copy pairwise cosines are preserved (planted near-dup
  structure replicates), cross-copy cosines are uncorrelated.
* **customer**: two variants.  ``sf0.5`` keeps c_nationkey (25 blocks,
  5x deeper — the quadratic-by-contract control for blocked pair
  operators) and ``sf0.5blocks`` shifts nationkey by 25 per copy
  (5x block count at constant depth — the constant-density model of
  real growth, where linearity is the claim under test).

Measured results live in SCALING.md §"Round-13 sf0.5 linearity".
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

D = 36_036_000
SRC = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    # Defaults derive from --copies (round-15, ADVICE r14): a fixed
    # /tmp/sf0.5 default plus --copies 25 silently overwrote the sf0.5
    # notch slice with 25x data, and the _NOTCH-gated floor tests
    # (gated only on the env var plus the directory existing) would
    # then assert against mislabeled data.  copies=5 -> /tmp/sf0.5,
    # copies=25 -> /tmp/sf2.5 — same paths as before for the two
    # established octaves, collision-free for any other count.
    ap.add_argument("--out", default=None)
    ap.add_argument("--out-blocks", default=None)
    # Round-14: the same construction generalizes to any copy count —
    # --copies 25 writes an sf2.5-equivalent slice (second scale
    # octave: 5x the sf0.5 notch).  Embedding rolls stay distinct as
    # long as copies < vector dim; id offsets k*D never collide.
    ap.add_argument("--copies", type=int, default=5)
    # Round-16 probe knobs (r15 verdict item 4):
    # --tables: generate only the named tables (a 125x lineitem concat
    #   in pandas is pointless when the probe reads embeddings only).
    # --namevar: ALSO write /tmp/sf{x}namevar/customer.parquet where
    #   copy k's c_name gets a per-copy suffix of 3 IDENTICAL letters
    #   (' aaa', ' bbb', ...): suffixes are pairwise edit distance 3,
    #   so no cross-copy pair or FastSS deletion-variant collision
    #   survives max_dist=1 — bucket COUNT scales with copies at
    #   CONSTANT depth, the non-adversarial constant-density model of
    #   real growth (within-copy distances are preserved exactly: both
    #   members of a pair get the same suffix).  25 copies of the
    #   default slice duplicate every c_name per copy instead —
    #   deliberately adversarial depth x25.
    ap.add_argument("--tables", nargs="+", default=None,
                    help="subset of tables to generate (default: all)")
    ap.add_argument("--namevar", action="store_true")
    args = ap.parse_args()
    K = args.copies
    if args.out is None:
        args.out = f"/tmp/sf{K / 10:g}"
    if args.out_blocks is None:
        args.out_blocks = f"/tmp/sf{K / 10:g}blocks"
    os.makedirs(args.out, exist_ok=True)
    os.makedirs(args.out_blocks, exist_ok=True)

    def want(t: str) -> bool:
        return args.tables is None or t in args.tables

    if want("documents"):
        _gen_documents(args, K)
    if want("embeddings"):
        _gen_embeddings(args, K)
    if want("orders") or want("lineitem"):
        _gen_tpch(args, K)
    if want("events"):
        _gen_events(args, K)
    if want("customer"):
        _gen_customer(args, K)
    elif args.namevar:
        # --namevar only has an effect inside the customer generator
        # (ADVICE r16): passing it while --tables excludes customer
        # would otherwise silently do nothing.
        raise SystemExit(
            "--namevar requires 'customer' in --tables (the namevar "
            "slice is a customer.parquet variant)")
    print("done: tables", args.tables or "ALL", "->", args.out)


def _gen_documents(args, K: int) -> None:
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    parts = []
    for k in range(K):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + k * D
        if k:
            c["text"] = [" ".join(w + f"k{k}" for w in t.split(" "))
                         for t in c["text"]]
            c["n_chars"] = c["text"].str.len()
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                   f"{args.out}/documents.parquet")


def _gen_embeddings(args, K: int) -> None:
    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    dim = len(np.asarray(emb["embedding"].iloc[0]))
    parts = []
    for k in range(K):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + k * D
        if k:
            # roll by k mod dim; NEGATE on each wrap (round 16): a bare
            # roll collides at k = dim (roll dim ≡ roll 0 → exact
            # cross-copy duplicates), so copy counts past the vector
            # dim — the 125x third-octave probe — would plant spurious
            # cosine-1 pairs.  Negation preserves norms and within-copy
            # cosines; wrapped copies score -1 against their unwrapped
            # sibling, not +1.  Distinct for copies < 2*dim.
            sgn = -1.0 if (k // dim) % 2 else 1.0
            c["embedding"] = [
                (sgn * np.roll(np.asarray(v), k % dim)).astype(np.float32)
                for v in c["embedding"]]
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    sch = pq.read_schema(f"{SRC}/embeddings.parquet")
    tbl = pa.Table.from_pandas(out, preserve_index=False)
    tbl = tbl.cast(pa.schema([sch.field(n) for n in tbl.schema.names]))
    pq.write_table(tbl, f"{args.out}/embeddings.parquet")


def _gen_tpch(args, K: int) -> None:
    # TPC-H core: orders/lineitem 5x with MATCHED key offsets so every
    # join key resolves inside its copy; dimensions (region/nation/
    # part/supplier) ride along unchanged — at real 5x scale the
    # dimension tables do not grow either.
    orders = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    po, pl = [], []
    for k in range(K):
        o = orders.copy()
        o["o_orderkey"] = o["o_orderkey"] + k * D
        o["o_custkey"] = o["o_custkey"] + k * D
        po.append(o)
        l = li.copy()
        l["l_orderkey"] = l["l_orderkey"] + k * D
        pl.append(l)
    for name, parts in (("orders", po), ("lineitem", pl)):
        out = pd.concat(parts, ignore_index=True)
        sch = pq.read_schema(f"{SRC}/{name}.parquet")
        t = pa.Table.from_pandas(out, preserve_index=False)
        t = t.cast(pa.schema([sch.field(n) for n in t.schema.names]))
        pq.write_table(t, f"{args.out}/{name}.parquet")
    import shutil
    for t in ("region", "nation", "part", "supplier"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{args.out}/{t}.parquet")


def _gen_events(args, K: int) -> None:
    # events 5x (round-14, r13 verdict item 5: the batch-merge
    # streaming twins read events): event_id AND user_id offset by
    # k*D, timestamps UNCHANGED — the constant-time-range model where
    # growth means more concurrent keys, so per-(user, hour) state
    # cardinality scales 5x while window count stays fixed.  Shifting
    # time instead would grow batch COUNT, which the 4-slice replay
    # pins by construction.  Rate-limit admission is per-user, so each
    # copy replicates the sf0.1 admission pattern exactly.
    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    parts = []
    for k in range(K):
        c = ev.copy()
        c["event_id"] = c["event_id"] + k * D
        c["user_id"] = c["user_id"] + k * D
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    sch = pq.read_schema(f"{SRC}/events.parquet")
    t = pa.Table.from_pandas(out, preserve_index=False)
    t = t.cast(pa.schema([sch.field(n) for n in t.schema.names]))
    pq.write_table(t, f"{args.out}/events.parquet")


def _gen_customer(args, K: int) -> None:
    cust = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
    dests = [(args.out, False, False), (args.out_blocks, True, False)]
    if args.namevar:
        nv = args.out.rstrip("/") + "namevar"
        os.makedirs(nv, exist_ok=True)
        dests.append((nv, False, True))
    for dest, nk_shift, namevar in dests:
        parts = []
        for k in range(K):
            c = cust.copy()
            c["c_custkey"] = c["c_custkey"] + k * D
            if nk_shift:
                c["c_nationkey"] = (c["c_nationkey"] + 25 * k).astype("int32")
            if namevar:
                # per-copy 3-letter suffix, pairwise edit distance 3 —
                # see the --namevar help text for the model
                c["c_name"] = c["c_name"] + " " + chr(ord("a") + k % 26) * 3
            parts.append(c)
        out = pd.concat(parts, ignore_index=True)
        sch = pq.read_schema(f"{SRC}/customer.parquet")
        t = pa.Table.from_pandas(out, preserve_index=False)
        t = t.cast(pa.schema([sch.field(n) for n in t.schema.names]))
        pq.write_table(t, f"{dest}/customer.parquet")
    print("wrote", [d for d, _, _ in dests])


if __name__ == "__main__":
    main()
