#!/usr/bin/env python3
"""Attribute docs_lang_id's per-batch Python constant — no Spark.

The round-11 vectorized path (lang_id.py) measured 12.3 s @125× /
98.3 s @3125×; this probe times the pure-Python kernel stages on the
real sf0.1 texts, replicated in-process, to say WHERE the remaining
constant lives (utf-32 decode vs window packing vs profile lookup vs
per-language bincount) and what fraction of the Spark wall is kernel
vs boundary (scan + Arrow transfer + scheduling).

Usage: python tools/langid_floor_probe.py [--mult 10] [--batch 10000]
Prints a summary JSON line with per-MB constants.

Measurement note: per-stage numbers are the MIN over ``--repeats``
full passes (the bench.py discipline) — single-pass numbers on this
host are dominated by first-touch page faults and host contention
(measured: identical 3M-element numpy ops varying 0.007 s ↔ 0.9 s
run-to-run; the min is stable at ~0.02 s).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grpc_map_reduce_spark.operators.lang_id import (  # noqa: E402
    LANG_PROFILE_K,
    _batch_trigram_codes,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    t = pq.read_table(os.path.join(args.sf_dir, "documents.parquet"),
                      columns=["text", "lang"])
    src_texts = t.column("text").to_pylist()
    src_langs = t.column("lang").to_pylist()
    texts = src_texts * args.mult
    langs = sorted(set(src_langs), reverse=True)
    # ADVICE r11: bytes over ONE source copy × mult — set(texts)
    # dropped exact-duplicate docs (this is a dedup corpus) from the
    # denominator while the loop still processed them, inflating
    # kernel_sec_per_mb.
    mb = sum(len(x.encode()) for x in src_texts) * args.mult / 1e6
    n = len(texts)

    # Build the profile the way classify_langs_codes does (ADVICE r11:
    # per-language top-K with per-language mask bits — the old all-ones
    # mask made every language's bincount but one run on an empty
    # selection, understating that stage vs the real kernel).
    li_of = {lang: i for i, lang in enumerate(langs)}
    code_mask: dict[int, int] = {}
    for lang in langs:
        codes_l, _ = _batch_trigram_codes(
            [x.lower() for x, lg in zip(src_texts, src_langs) if lg == lang]
        )
        if not codes_l.size:
            continue
        u, c = np.unique(codes_l, return_counts=True)
        order = np.lexsort((u, -c))  # (count desc, code asc) like the window
        for code in u[order][:LANG_PROFILE_K]:
            code_mask[int(code)] = code_mask.get(int(code), 0) | (1 << li_of[lang])
    prof_codes = np.array(sorted(code_mask), dtype=np.int64)
    prof_mask = np.array([code_mask[c] for c in sorted(code_mask)],
                         dtype=np.int64)

    best = {"lower": 9e9, "trigram_codes": 9e9, "searchsorted": 9e9,
            "bincount": 9e9}
    best_wall = 9e9
    for _rep in range(args.repeats):
        stages = dict.fromkeys(best, 0.0)
        t_total = time.perf_counter()
        for i in range(0, n, args.batch):
            batch = texts[i: i + args.batch]
            t0 = time.perf_counter()
            lowered = [x.lower() for x in batch]
            t1 = time.perf_counter()
            codes, doc_idx = _batch_trigram_codes(lowered)
            t2 = time.perf_counter()
            pos = np.minimum(np.searchsorted(prof_codes, codes),
                             len(prof_codes) - 1)
            hit = prof_codes[pos] == codes
            masks = prof_mask[pos[hit]]
            hdoc = doc_idx[hit]
            t3 = time.perf_counter()
            for li in range(len(langs)):
                sel = (masks >> li) & 1
                np.bincount(hdoc[sel.astype(bool)], minlength=len(batch))
            t4 = time.perf_counter()
            stages["lower"] += t1 - t0
            stages["trigram_codes"] += t2 - t1
            stages["searchsorted"] += t3 - t2
            stages["bincount"] += t4 - t3
        best_wall = min(best_wall, time.perf_counter() - t_total)
        for k, v in stages.items():
            best[k] = min(best[k], v)

    out = {
        "docs": n, "mb": round(mb, 1), "langs": len(langs),
        "batch": args.batch, "repeats": args.repeats,
        "stage_sec_min": {k: round(v, 3) for k, v in best.items()},
        "kernel_sec_min": round(best_wall, 3),
        "kernel_sec_per_mb": round(best_wall / mb, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
