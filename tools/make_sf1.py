#!/usr/bin/env python3
"""Derive an sf1-equivalent bench corpus (10x sf0.1) for the SCALING
measurement in BASELINE.md — driver-side tooling, not engine code.

The driver ships testdata only up to sf0.1; this replicates its three
big tables 10x with disjoint id ranges so the headline queries' work
actually grows 10x:

- documents: doc_id += k*10_000_000 per replica k; for k > 0 the token
  order is deterministically shuffled per doc (seeded by the new id), so
  replicas keep the exact token/length distributions but are NOT
  near-duplicates of each other — without this, every dedup query would
  measure a corpus that is 90% duplicate groups instead of 10x data.
- orders: o_orderkey += k*100_000_000 (other columns copied verbatim).
- events: event_id += k*10_000_000, user_id += k*1_000_000 (distinct
  users grow 10x; timestamps unchanged so the bucket grain is constant).

The remaining seven tables are copied verbatim (no target query reads
them at sf1). Usage: python3 tools/make_sf1.py [/tmp/sf1]
"""
import random
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def shuffle_text(text: str, seed: int) -> str:
        toks = text.split()
        random.Random(seed).shuffle(toks)
        return " ".join(toks)

    con.create_function("shuffle_text", shuffle_text)

    parts = " UNION ALL ".join(
        f"""SELECT doc_id + {k * 10_000_000} AS doc_id,
                   {'text' if k == 0 else f'shuffle_text(text, doc_id + {k * 10_000_000})'} AS text,
                   lang, source, n_chars
            FROM src"""
        for k in range(REPLICAS))
    con.execute(f"CREATE VIEW src AS SELECT * FROM '{SRC}/documents.parquet'")
    con.execute(f"COPY ({parts}) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    con.execute("DROP VIEW src")

    parts = " UNION ALL ".join(
        f"""SELECT * REPLACE (o_orderkey + {k * 100_000_000} AS o_orderkey)
            FROM src""" for k in range(REPLICAS))
    con.execute(f"CREATE VIEW src AS SELECT * FROM '{SRC}/orders.parquet'")
    con.execute(f"COPY ({parts}) TO '{dst}/orders.parquet' (FORMAT PARQUET)")
    con.execute("DROP VIEW src")

    parts = " UNION ALL ".join(
        f"""SELECT * REPLACE (event_id + {k * 10_000_000} AS event_id,
                              user_id + {k * 1_000_000} AS user_id)
            FROM src""" for k in range(REPLICAS))
    con.execute(f"CREATE VIEW src AS SELECT * FROM '{SRC}/events.parquet'")
    con.execute(f"COPY ({parts}) TO '{dst}/events.parquet' (FORMAT PARQUET)")

    # embeddings: vec_id += k*10_000_000 per replica; for k > 0 each
    # vector gets deterministic seeded Gaussian noise at ~0.3 relative
    # norm (cosine vs source ~0.95) so replicas keep the geometry but are
    # NOT semantic twins of their source — without this, every
    # cosine>=0.99 query measures a corpus where 90% of vectors have 9
    # exact copies instead of 10x independent data.
    import math

    def perturb(vec, seed):
        rng = random.Random(seed)
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        scale = 0.3 * norm / math.sqrt(len(vec))
        return [x + rng.gauss(0.0, scale) for x in vec]

    con.create_function("perturb", perturb, ["FLOAT[]", "BIGINT"], "FLOAT[]")
    con.execute("DROP VIEW src")
    parts = " UNION ALL ".join(
        f"""SELECT vec_id + {k * 10_000_000} AS vec_id,
                   {'embedding' if k == 0 else
                    f'perturb(embedding, vec_id + {k * 10_000_000})'}
                     AS embedding,
                   label
            FROM src""" for k in range(REPLICAS))
    con.execute(f"CREATE VIEW src AS SELECT * FROM '{SRC}/embeddings.parquet'")
    con.execute(f"COPY ({parts}) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")

    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    for t in ["documents", "orders", "events", "embeddings"]:
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
