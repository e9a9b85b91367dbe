"""Generate an Nx replicated scale corpus from a testdata sf dir
(default: 10x /root/testdata/sf0.1 -> ./scale_corpus/x10).

Replication rule (round-2 VERDICT "Next round #2" — measured scaling
curve): replica k of a document re-suffixes every word with '~r{k}', so
each replica is a full structural copy of the source corpus (same
shingle df distribution, same planted near-dup pairs WITHIN a replica)
whose vocabulary is disjoint from every other replica — near-dup and
LSH workload shape is preserved while cross-replica collisions are
impossible.  Replica 0 keeps the original text verbatim.  Embeddings
replicate with offset vec_ids and identical vectors (queries and
quantizer seeds stay the replica-0 originals, so ANN query work scales
with corpus size only).

Output is NOT committed (see .gitignore); BENCH_scale.json records the
measured wall times.

Usage: python tools/gen_scale_corpus.py [src_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "scale_corpus/x10"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    n_docs, max_doc = con.execute(
        f"SELECT COUNT(*), MAX(doc_id) FROM '{src}/documents.parquet'"
    ).fetchone()
    n_vecs, max_vec = con.execute(
        f"SELECT COUNT(*), MAX(vec_id) FROM '{src}/embeddings.parquet'"
    ).fetchone()

    con.execute(
        f"""
        COPY (
            SELECT doc_id + k * {max_doc + 1} AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE array_to_string(
                            list_transform(string_split(text, ' '),
                                           w -> w || '~r' || k), ' ')
                   END AS text,
                   lang, source,
                   length(CASE WHEN k = 0 THEN text
                          ELSE array_to_string(
                              list_transform(string_split(text, ' '),
                                             w -> w || '~r' || k), ' ')
                          END) AS n_chars
            FROM '{src}/documents.parquet', UNNEST(range({factor})) t(k)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT vec_id + k * {max_vec + 1} AS vec_id, embedding, label
            FROM '{src}/embeddings.parquet', UNNEST(range({factor})) t(k)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    got_docs = con.execute(f"SELECT COUNT(*) FROM '{out}/documents.parquet'").fetchone()[0]
    got_vecs = con.execute(f"SELECT COUNT(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    assert got_docs == n_docs * factor and got_vecs == n_vecs * factor
    print(f"wrote {out}: {got_docs} docs, {got_vecs} embeddings ({factor}x {src})")


if __name__ == "__main__":
    main()
