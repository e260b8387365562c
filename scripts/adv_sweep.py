#!/usr/bin/env python3
"""Adversarial-corpus oracle sweep (dev tool, driver-side python only).

The t2 gate exercises the oracles on the driver's well-behaved synthetic
corpus; cross-engine divergence is usually DATA-dependent (null text,
null lang/source, unicode, empty tokens from doubled spaces, degenerate
one-token docs, 10k-token outliers). This script regenerates a hostile
documents table under /tmp/adv_corpus (other tables copied from
sf0.001), then the usual Verify + check.py pair compares Spark against
DuckDB on it for every documents-backed query.

Usage:
  python3 scripts/adv_sweep.py                     # build the corpus
  sbt "runMain graft.Verify /tmp/adv_corpus /tmp/vadv <names>"
  python3 scripts/check.py /tmp/adv_corpus /tmp/vadv

Round-7 result: 19/19 documents-backed queries (waves 4-7 plus the
null-sensitive older ones) PASS on this corpus.
"""
import random
import shutil
import subprocess
import sys

import duckdb

DIR = "/tmp/adv_corpus"


def main():
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
