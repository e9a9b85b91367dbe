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


def fresh_embeddings(src: str, out: str, factor: int) -> None:
    """--fresh mode (round-7 VERDICT #1): the REPLICATED corpus is
    degenerate for ANN recall (every replica's neighbors share its
    quantizer cell — recall measures 1.0 at any scale), so this mode
    grows the embedding table with genuinely NEW vectors drawn from the
    source distribution: per-label mean + isotropic residual fitted
    from the source, unit-normalized like the source.  Replica block k
    uses rng seed 1000+k, so the x10 corpus is an exact prefix of the
    x30 corpus and the recall curve compares like-for-like.  Replica 0
    keeps the original vectors verbatim (queries vec_id < N_QUERIES and
    quantizer seed vectors stay identical across scale points — only
    the candidate pool grows)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    label = t.column("label").to_numpy()
    n, dims = emb.shape
    labels = np.unique(label)
    means = {int(l): emb[label == l].mean(axis=0) for l in labels}
    resid_std = float(
        np.std(np.concatenate([emb[label == l] - means[int(l)] for l in labels]))
    )
    props = np.array([(label == l).mean() for l in labels])

    out_ids = [vec_id]
    out_emb = [emb.astype(np.float32)]
    out_lab = [label]
    max_vec = int(vec_id.max())
    for k in range(1, factor):
        rng = np.random.default_rng(1000 + k)
        labs = rng.choice(labels, size=n, p=props)
        mu = np.stack([means[int(l)] for l in labs])
        v = mu + rng.standard_normal((n, dims)) * resid_std
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        out_ids.append(vec_id + k * (max_vec + 1))
        out_emb.append(v.astype(np.float32))
        out_lab.append(labs.astype(label.dtype))

    ids = np.concatenate(out_ids)
    vecs = np.concatenate(out_emb)
    labs = np.concatenate(out_lab)
    table = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labs, type=pa.int32()),
        }
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(table, f"{out}/embeddings.parquet")
    print(f"wrote {out}/embeddings.parquet: {len(ids)} fresh-mode vectors "
          f"({factor}x {src}, resid_std={resid_std:.4f})")


def main() -> None:
    if "--fresh" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        src = args[0] if args else "/root/testdata/sf0.1"
        out = args[1] if len(args) > 1 else "scale_corpus/fresh_x10"
        factor = int(args[2]) if len(args) > 2 else 10
        fresh_embeddings(src, out, factor)
        return
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
    # part replicates with replica-disjoint ER blocking keys: replica k
    # rewrites every letter through a Caesar shift of k positions over a
    # 30-symbol cycle (a-z plus 0-3; spaces fixed), so each replica's
    # name set is vocabulary-disjoint from every other's while the
    # PER-NAME diversity of the prefix-4 / suffix-4 block keys is
    # preserved EXACTLY (the substitution is a bijection on characters).
    # A tag-wrapping rule ('r{k}~' || name) was measured and rejected:
    # for two-digit k the 4-char tag dominates both block keys, every
    # replica collapses into ONE block per brand, and the x30 sweep
    # measures the corpus artifact (9.9x wall on 3x data), not the
    # operator.  Edit-distance workload within a replica is preserved:
    # dirty variants derive from the substituted name itself.
    max_part = con.execute(
        f"SELECT MAX(p_partkey) FROM '{src}/part.parquet'"
    ).fetchone()[0]
    cycle = "abcdefghijklmnopqrstuvwxyz0123"
    assert factor <= len(cycle), "Caesar cycle shorter than replica count"
    branches = []
    for k in range(factor):
        rot = cycle[k:] + cycle[:k]
        branches.append(
            f"""SELECT p_partkey + {k} * {max_part + 1} AS p_partkey,
                   translate(p_name, '{cycle}', '{rot}') AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM '{src}/part.parquet'"""
        )
    con.execute(
        f"""
        COPY ({' UNION ALL '.join(branches)})
        TO '{out}/part.parquet' (FORMAT PARQUET)
        """
    )
    got_docs = con.execute(f"SELECT COUNT(*) FROM '{out}/documents.parquet'").fetchone()[0]
    got_vecs = con.execute(f"SELECT COUNT(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    got_parts = con.execute(f"SELECT COUNT(*) FROM '{out}/part.parquet'").fetchone()[0]
    n_parts = con.execute(f"SELECT COUNT(*) FROM '{src}/part.parquet'").fetchone()[0]
    assert got_docs == n_docs * factor and got_vecs == n_vecs * factor
    assert got_parts == n_parts * factor
    print(f"wrote {out}: {got_docs} docs, {got_vecs} embeddings, "
          f"{got_parts} parts ({factor}x {src})")


if __name__ == "__main__":
    main()
