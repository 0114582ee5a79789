"""Generate a LARGER scale point for the scaling probe.

The driver ships read-only testdata up to sf0.1, where per-job fixed
overhead still dominates most probe queries and the SCALING.md ratios are
insensitive. This generator produces schema-identical, distribution-matched
synthetic tables at an arbitrary scale factor (row counts, value domains,
key relationships, duplicate structure, and unit-norm embedding geometry
all mirror the sf0.1 driver tables — verified against them column by
column) so `tools/scale_probe.py` can add a 5x point above the driver's
largest.

Deterministic: same (sf, seed) → identical bytes. Pure numpy + pyarrow —
no Spark session needed, and generation stays O(rows).

Usage: python tools/gen_scale_data.py <sf> <out_dir>   # e.g. 0.5 testdata_sf0.5
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PWORDS = ["large", "hot", "blue", "red", "small", "green", "ring", "bolt",
          "screw", "washer", "nut", "cog"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
# the driver documents' 31-word vocabulary (observed at sf0.1)
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "fast",
         "filter", "group", "hash", "join", "key", "line", "merge", "order",
         "part", "query", "row", "scan", "slow", "small", "sort", "spark",
         "stream", "table", "the", "value", "vector", "window", "zone"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]

DAY_US = 86_400_000_000


def _ts_us(base_iso: str) -> int:
    return np.datetime64(base_iso, "us").astype(np.int64)


# Parquet row-group size (rows). None = pyarrow default (one giant group
# for these table sizes — the driver testdata's layout, where every scan
# stage starts on ONE populated split). VERDICT r11 #5: a multi-row-group
# variant lets the bench measure real parallel scans, so spread()'s
# single-file mitigation can be re-evaluated against a layout a
# production table would actually have.
ROW_GROUP_SIZE: int | None = None


def write(out_dir: str, name: str, table: pa.Table) -> None:
    kw = {}
    if ROW_GROUP_SIZE:
        kw["row_group_size"] = ROW_GROUP_SIZE
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"), **kw)
    print(f"{name}: {table.num_rows} rows")


def main(sf: float, out_dir: str, seed: int = 42,
         row_group_size: int | None = None) -> None:
    global ROW_GROUP_SIZE
    ROW_GROUP_SIZE = row_group_size
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)

    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS)}))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-999.99, 9999.99, n_cust), 2)),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)])}))

    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-999.99, 9999.99, n_supp), 2))}))

    adj = np.array(PWORDS[:6])[rng.integers(0, 6, n_part)]
    noun = np.array(PWORDS[6:])[rng.integers(0, 6, n_part)]
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(
            np.round(rng.uniform(900.0, 2000.0, n_part), 2))}))

    o_base = _ts_us("1995-01-01T00:00:00")
    o_span_days = 2404  # → max 2001-08-01, matching the driver tables
    o_dates = o_base + rng.integers(0, o_span_days + 1, n_ord) * DAY_US
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2)),
        "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)])}))

    lines_per = rng.integers(1, 8, n_ord)  # avg ≈ 4, range 1..7
    l_order = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_order)
    l_linenumber = (np.arange(n_li, dtype=np.int64)
                    - np.repeat(np.cumsum(lines_per) - lines_per,
                                lines_per) + 1)
    l_ship = (np.repeat(o_dates, lines_per)
              + rng.integers(1, 96, n_li) * DAY_US)
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_order),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(l_linenumber.astype(np.int32)),
        "l_quantity": pa.array(
            rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900.0, 105_000.0, n_li), 2)),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(l_ship, pa.timestamp("us"))}))

    e_base = _ts_us("2024-01-01T00:00:00")
    e_ts = e_base + rng.integers(0, 30 * DAY_US, n_evt)
    write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt, dtype=np.int64)),
        "ts": pa.array(e_ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(n_cust // 10, 1), n_evt)),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_evt), 2)),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, n_evt)])}))

    # documents: 31-word vocab, 8-110 tokens, ~0.2% exact dups and ~0.5%
    # near-dups (one token swapped) appended after the base docs — the
    # same dup structure the driver corpus carries.
    lengths = rng.integers(8, 111, n_doc)
    base_texts = [" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), ln)])
                  for ln in lengths]
    texts = list(base_texts)
    n_exact = max(n_doc // 500, 1)
    n_near = max(n_doc // 200, 1)
    for src in rng.integers(0, n_doc, n_exact):
        texts.append(base_texts[src])
    for src in rng.integers(0, n_doc, n_near):
        toks = base_texts[src].split(" ")
        pos = rng.integers(0, len(toks))
        # a swap that resamples the SAME token would silently emit an
        # extra exact dup (~1/31 per doc), skewing the exact/near split
        # the dedup scaling ratios are read against — offset past it
        repl = VOCAB[rng.integers(0, len(VOCAB))]
        if repl == toks[pos]:
            repl = VOCAB[(VOCAB.index(repl) + 1) % len(VOCAB)]
        toks[pos] = repl
        texts.append(" ".join(toks))
    n_doc_total = len(texts)
    langs = np.array(LANGS)[rng.choice(5, n_doc_total, p=LANG_P)]
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc_total, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(
            [f"src{i}" for i in rng.integers(0, 20, n_doc_total)]),
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype=np.int64))}))

    # embeddings: unit-norm 64-dim vectors around 10 label centroids,
    # matching the driver geometry (norm 1.0, labels 0-9).
    centroids = rng.normal(0, 1, (10, 64))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vec)
    vecs = centroids[labels] + rng.normal(0, 0.35, (n_vec, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
        "embedding": pa.array(
            [row for row in vecs.astype(np.float32)],
            pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32))}))

    # Completion marker, written LAST: consumers (tools/scale_probe.py)
    # key regeneration off it, so a killed-mid-run or pre-marker-era
    # directory is rebuilt instead of silently half-read. The content
    # identifies what was generated so a parameter change invalidates it.
    # gen= is the GENERATOR version: bump it whenever the data-shaping
    # logic changes (gen=2: near-dup swaps can no longer resample the
    # identical token), so pre-fix directories regenerate instead of
    # being silently consumed with the old distribution.
    with open(os.path.join(out_dir, "_GEN_COMPLETE"), "w") as f:
        f.write(f"sf={sf} seed={seed} gen=2"
                + (f" rgs={row_group_size}" if row_group_size else "")
                + "\n")


if __name__ == "__main__":
    main(float(sys.argv[1]),
         sys.argv[2] if len(sys.argv) > 2 else f"testdata_sf{sys.argv[1]}",
         row_group_size=(int(sys.argv[3]) if len(sys.argv) > 3 else None))
