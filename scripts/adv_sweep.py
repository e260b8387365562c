#!/usr/bin/env python3
"""Adversarial-corpus oracle sweep (dev tool, driver-side python only).

The t2 gate exercises the oracles on the driver's well-behaved synthetic
corpus; cross-engine divergence is usually DATA-dependent (null text,
null lang/source, unicode, empty tokens from doubled spaces, degenerate
one-token docs, 10k-token outliers). This script regenerates a hostile
documents table under /tmp/adv_corpus (other tables copied from
sf0.001), then the usual Verify + check.py pair compares Spark against
DuckDB on it for every documents-backed query.

Two corpora: /tmp/adv_corpus (hostile documents) and /tmp/adv_events
(hostile events — timestamp ties, single-sided view/purchase cohorts,
midnight boundaries, extreme values, null/empty/malformed props).

Usage:
  python3 scripts/adv_sweep.py                     # build both corpora
  sbt "runMain graft.Verify /tmp/adv_corpus /tmp/vadv <names>"
  python3 scripts/check.py /tmp/adv_corpus /tmp/vadv
  # …and the same pair against /tmp/adv_events for events-backed queries

Round-7 results: 19/19 documents-backed queries PASS; the events sweep
caught (and the fixes now pin) an ANSI-mode cast abort in json_extract
on non-integer JSON values and oracle-side json_extract_string errors
on malformed/empty props in json_extract/variant_stats — after the
TRY_CAST hardening, 20/20 events-backed queries PASS.

Round-7 fourth session: the FULL registry (181 queries) now runs against
all three hostile corpora, which surfaced and fixed:
 - contentHash/doc_fingerprint NULL-text divergence (Spark NULL vs
   DuckDB list_prepend-[0] → 0); both sides now coalesce(text, '').
 - tokenCumsum's offsets equi-join dropped NULL-lang rows the oracle's
   window PARTITION BY kept (shard_packing/pack_sequences).
 - polyHash/polyHash2/cdcBounds folded UTF-8 BYTES / UTF-16 units while
   the oracles fold CODEPOINTS — divergent on any non-ASCII char
   (café/emoji); all kernels now iterate codepoints.
 - a DuckDB 1.0 list_reduce bug: a CASE branching on the ACCUMULATOR
   inside the lambda miscomputes when many varying-length lists share a
   chunk (span_corruption); the oracle fold is now branch-free
   boolean-arithmetic.
 - pack_sequences' all-null offset groups ('' in concat_ws vs NULL in
   string_agg), global_row_number's un-CAST TIMESTAMPTZ output, and
   approx_quantiles' value-window claim, which the sketch guarantee
   does not imply on sparse tails (now the true rank-window check).
After the fixes: 181/181 PASS on /tmp/adv_corpus, /tmp/adv_events and
/tmp/adv_emb, and 181/181 on the driver corpus at all three sfs.
"""
import random
import shutil
import subprocess
import sys

import duckdb

DIR = "/tmp/adv_corpus"
EDIR = "/tmp/adv_events"


def build_events():
    subprocess.run(["mkdir", "-p", EDIR], check=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{EDIR}/{t}.parquet")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("""CREATE TABLE e (event_id BIGINT, ts TIMESTAMPTZ,
      user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)""")
    rows, eid = [], 0

    def add(ts, user, typ, val, props):
        nonlocal eid
        rows.append((eid, ts, user, typ, val, props))
        eid += 1

    # user 1: ten events at the SAME instant (tiebreak stress)
    for i in range(10):
        add("2024-01-01 12:00:00+00", 1,
            ["view", "click", "purchase", "view", "scroll"][i % 5],
            float(i), '{"k":%d}' % i)
    # user 2: purchases only (null backward/forward as-of paths)
    for i in range(6):
        add(f"2024-01-02 0{i}:30:00+00", 2, "purchase", 10.0 * i, None)
    # user 3: views only
    for i in range(6):
        add(f"2024-01-03 0{i}:15:00+00", 3, "view", -10.0 * i, "")
    # user 4: extreme values, midnight boundaries, malformed props
    add("2024-01-04 00:00:00+00", 4, "view", 0.0, '{bad')
    add("2024-01-04 00:00:00+00", 4, "purchase", 1e9, '{"k":null}')
    add("2024-01-05 00:00:00+00", 4, "view", -1e9, None)
    add("2024-01-05 23:59:59.999999+00", 4, "purchase", 1e-9, '{"k":"v"}')
    # user 5: a normal week of alternating activity
    random.seed(3)
    for d in range(1, 8):
        for i in range(4):
            add(f"2024-01-0{d} {10 + i}:0{i}:0{i}+00", 5,
                random.choice(["view", "purchase", "click"]),
                random.uniform(-50, 50), '{"k":1}')
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"COPY e TO '{EDIR}/events.parquet' (FORMAT PARQUET)")
    print(f"built {EDIR}/events.parquet with "
          f"{con.sql('SELECT count(*) FROM e').fetchone()[0]} hostile events")


MDIR = "/tmp/adv_emb"


def build_embeddings():
    subprocess.run(["mkdir", "-p", MDIR], check=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{MDIR}/{t}.parquet")
    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    rows = [
        (0, [0.0] * 64, 0),                              # ZERO query vector
        (1, [1.0] * 64, 1),                              # all-positive
        (2, [-1.0] * 64, 2),                             # all-negative
        (3, [1e-40] * 64, 3),                            # denormal floats
        (4, [(-1.0) ** i for i in range(64)], 4),        # alternating signs
        (5, [1.0] * 64, 1),                              # duplicate of 1
        (6, [0.0] * 64, None),                           # zero + NULL label
    ]
    random.seed(11)
    for i in range(7, 60):
        rows.append((i, [random.uniform(-1, 1) for _ in range(64)],
                     random.choice(range(8))))
    con.executemany("INSERT INTO e VALUES (?,?,?)", rows)
    con.execute(f"COPY e TO '{MDIR}/embeddings.parquet' (FORMAT PARQUET)")
    print(f"built {MDIR}/embeddings.parquet with "
          f"{con.sql('SELECT count(*) FROM e').fetchone()[0]} hostile vectors")


def main():
    build_events()
    build_embeddings()
    subprocess.run(["mkdir", "-p", DIR], check=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{DIR}/{t}.parquet")
    con = duckdb.connect()
    rows = [
        (0, None, "en", "web", 0),                        # null text
        (1, "", "en", "web", 0),                          # empty text
        (2, "x", "en", "web", 1),                         # single token
        (3, "  double  spaces  here  ", "en", "web", 24), # empty tokens
        (4, "的 了 是 在 的 了 是 在 hello the a of and", "zh", "cjk", 30),
        (5, "café naïve emoji 😀 mixed ascii the a of and more words here to pass",
         "fr", "uni", 60),
    ]
    run = " ".join(f"w{i}" for i in range(1, 12))         # shared 11-token run
    rows += [
        (6, run + " tail_a " + "filler " * 5, "en", "web", 80),
        (7, "head_b " + run + " other tail", "en", "mirror", 80),
        (8, "identical doc body with the a of and tokens repeated the a of and",
         "en", "web", 60),
        (9, "identical doc body with the a of and tokens repeated the a of and",
         "en", "mirror", 60),
    ]
    big = " ".join(f"t{i % 97}" for i in range(10000))    # 10k-token outlier
    rows += [
        (10, big, "en", "big", len(big)),
        (11, "el la de los words espanol the mixed", "es", "web", 40),
        (12, None, None, None, None),                     # all-null row
        (13, "der die das und german text here with enough words to matter ok",
         "de", "web", 60),
    ]
    random.seed(7)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "a", "of", "and",
             "el", "der", "le", "123", "x9"]
    for i in range(14, 60):
        t = " ".join(random.choice(vocab)
                     for _ in range(random.randint(1, 120)))
        rows.append((i, t, random.choice(["en", "es", "de", "fr", "zh"]),
                     random.choice(["web", "cjk", "uni", "big", "mirror"]),
                     len(t)))
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{DIR}/documents.parquet' (FORMAT PARQUET)")
    print(f"built {DIR}/documents.parquet with "
          f"{con.sql('SELECT count(*) FROM d').fetchone()[0]} hostile docs")


if __name__ == "__main__":
    sys.exit(main())
