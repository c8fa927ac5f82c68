"""In-engine TransE knowledge-graph embedding training.

The engine already exports everything KG-embedding trainers consume —
entity vocab, skip-gram pairs, negative samples (pipeline/kg.py,
operators/walks.py, operators/negatives.py; the reference leaves ALL of
this to downstream consumers, parsers.py writes flat TSVs). This
operator closes the loop the way operators/classifier.py did for
quality filtering: the TRAINING itself runs as DataFrame ops, so a
10^12-triple graph gets embedding epochs without leaving the cluster.

TransE (Bordes et al. 2013): score(s,p,o) = ||h_s + r_p − h_o||_1;
margin-ranking loss vs a corrupted-tail negative; subgradient descent.
Engineered here for EXACT cross-engine reproducibility — every number
in the run is a dyadic rational (k / 2^8), so float addition is exact
and summation-order-free, and the DuckDB oracle matches bit-for-bit
with NO rounding anywhere (a stronger contract than the classifier's
4-dp sigmoid scores):

- init: md5-hash → integer in [−128, 128] → /256 (denominator 2^8);
- L1 distance: subgradients are SIGNS (−1/0/+1 integers);
- update: integer gradient-count / 64 (lr = 2^-6);
- projection: L∞ clip to [−1, 1] via greatest/least (the paper's L2
  re-normalization needs sqrt — not dyadic, and not load-bearing for
  a margin-loss demonstration epoch; documented deviation);
- negative sampling: corrupted tail = vocab[md5(s|p|o) % |E|] — a
  deterministic function of the triple, no RNG state. Self-corruption
  (neg == obj) is a provable no-op (both sign terms cancel), so it
  needs no special-casing.

Scale shape (10^12 triples): per epoch, the triple×dim frame joins the
entity/relation embedding tables on (id, j) — four equi-joins keyed by
entity id (AQE-splittable; a hub entity is a hot JOIN key, not a
window); the margin activity is ONE per-triple aggregate; gradients are
ONE partial+final HashAggregate down to the (|E|·d)-sized embedding
frame; the update is a |E|·d-sized left join. Embeddings are
localCheckpointed per epoch (the iterative-plan discipline of
pagerank/components). The vocab window for negative indexing is the
same |V|-sized global rank as pipeline/kg.py::entity_vocab, with the
same documented bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INIT_DEN = 256  # init denominator 2^8
LR_DEN = 64  # learning rate 1/64 = 2^-6


def _hash60(value):
    return F.conv(F.substring(F.md5(value), 1, 15), 16, 10).cast("long")


def _init_val(kind: str, id_col, j_col):
    """Deterministic dyadic init in [−0.5, 0.5]: (md5 % 257 − 128)/256."""
    h = _hash60(
        F.concat(F.lit(kind), F.lit("|"), id_col, F.lit("|"), j_col.cast("string"))
    )
    return (F.pmod(h, F.lit(INIT_DEN + 1)) - F.lit(INIT_DEN // 2)) / F.lit(
        float(INIT_DEN)
    )


def transe_train(
    triples: DataFrame,
    dim: int = 4,
    epochs: int = 2,
    margin: float = 1.0,
) -> DataFrame:
    """Train TransE embeddings over ``triples(subj, pred, obj)``.

    Returns the long-form embedding table after ``epochs`` full-batch
    subgradient epochs: (kind 'E'|'R', id, j, val) — entities AND
    relations, every ``val`` an exact dyadic rational (see module
    docstring). Long form (one row per coordinate) is deliberate: the
    gradient aggregate and the update join are plain (id, j)-keyed
    HashAggregate/joins, and the oracle can reproduce them row-for-row.
    """
    dims = F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("j")

    ents = (
        triples.select(F.col("subj").alias("id"))
        .union(triples.select(F.col("obj").alias("id")))
        .distinct()
    )
    vocab = ents.select(
        "id", (F.row_number().over(Window.orderBy("id")) - 1).alias("idx")
    )
    n_ents = vocab.agg(F.count(F.lit(1)).alias("n"))
    trip = (
        triples.select("subj", "pred", "obj")
        .distinct()
        .crossJoin(n_ents)
        .select(
            "subj",
            "pred",
            "obj",
            F.pmod(
                _hash60(F.concat_ws("|", F.lit("N"), "subj", "pred", "obj")),
                F.col("n"),
            ).alias("_nidx"),
        )
        .join(vocab, F.col("_nidx") == F.col("idx"))
        .select("subj", "pred", "obj", F.col("id").alias("neg"))
        .localCheckpoint()
    )

    e_emb = ents.select("id", dims).select(
        "id", "j", _init_val("E", F.col("id"), F.col("j")).alias("val")
    )
    r_emb = (
        triples.select(F.col("pred").alias("id"))
        .distinct()
        .select("id", dims)
        .select("id", "j", _init_val("R", F.col("id"), F.col("j")).alias("val"))
    )

    for _ in range(epochs):
        td = trip.select("subj", "pred", "obj", "neg", dims)
        pd = (
            td.join(
                e_emb.select(
                    F.col("id").alias("subj"), "j", F.col("val").alias("_h")
                ),
                ["subj", "j"],
            )
            .join(
                r_emb.select(
                    F.col("id").alias("pred"), "j", F.col("val").alias("_r")
                ),
                ["pred", "j"],
            )
            .join(
                e_emb.select(
                    F.col("id").alias("obj"), "j", F.col("val").alias("_t")
                ),
                ["obj", "j"],
            )
            .join(
                e_emb.select(
                    F.col("id").alias("neg"), "j", F.col("val").alias("_tn")
                ),
                ["neg", "j"],
            )
            .select(
                "subj",
                "pred",
                "obj",
                "neg",
                "j",
                (F.col("_h") + F.col("_r") - F.col("_t")).alias("pdiff"),
                (F.col("_h") + F.col("_r") - F.col("_tn")).alias("ndiff"),
            )
        )
        act = (
            pd.groupBy("subj", "pred", "obj", "neg")
            .agg(
                F.sum(F.abs("pdiff")).alias("_dp"),
                F.sum(F.abs("ndiff")).alias("_dn"),
            )
            .where(F.lit(margin) + F.col("_dp") - F.col("_dn") > 0)
            .select("subj", "pred", "obj", "neg")
        )
        ct = pd.join(act, ["subj", "pred", "obj", "neg"], "left_semi").select(
            "subj",
            "pred",
            "obj",
            "neg",
            "j",
            F.signum("pdiff").cast("int").alias("sp"),
            F.signum("ndiff").cast("int").alias("sn"),
        )
        ge = (
            ct.select(F.col("subj").alias("id"), "j", (-(F.col("sp") - F.col("sn"))).alias("c"))
            .union(ct.select(F.col("obj").alias("id"), "j", F.col("sp").alias("c")))
            .union(ct.select(F.col("neg").alias("id"), "j", (-F.col("sn")).alias("c")))
            .groupBy("id", "j")
            .agg(F.sum("c").alias("g"))
        )
        gr = (
            ct.select(F.col("pred").alias("id"), "j", (-(F.col("sp") - F.col("sn"))).alias("c"))
            .groupBy("id", "j")
            .agg(F.sum("c").alias("g"))
        )
        clip = lambda v: F.greatest(F.lit(-1.0), F.least(F.lit(1.0), v))  # noqa: E731
        e_emb = (
            e_emb.join(ge, ["id", "j"], "left")
            .select(
                "id",
                "j",
                clip(
                    F.col("val") + F.coalesce("g", F.lit(0)) / F.lit(float(LR_DEN))
                ).alias("val"),
            )
            .localCheckpoint()
        )
        r_emb = (
            r_emb.join(gr, ["id", "j"], "left")
            .select(
                "id",
                "j",
                clip(
                    F.col("val") + F.coalesce("g", F.lit(0)) / F.lit(float(LR_DEN))
                ).alias("val"),
            )
            .localCheckpoint()
        )

    return e_emb.select(F.lit("E").alias("kind"), "id", "j", "val").union(
        r_emb.select(F.lit("R").alias("kind"), "id", "j", "val")
    )


def transe_oracle_ctes(links_cte: str, dim: int = 4, epochs: int = 2) -> str:
    """DuckDB twin over a ``links(subj, pred, obj)`` CTE chain: the
    identical init, negative indexing, and ``epochs`` unrolled
    subgradient epochs (same discipline as pagerank/LPA/classifier
    oracles). Bit-exact — no rounding in the SELECT."""

    def h60(expr: str) -> str:
        return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"

    def init(kind: str, idc: str) -> str:
        key = f"'{kind}|' || {idc} || '|' || CAST(j AS VARCHAR)"
        return (
            f"(({h60(key)} % {INIT_DEN + 1}) - {INIT_DEN // 2})"
            f" / {float(INIT_DEN)!r}"
        )
    steps = []
    pe, pr = "e0", "r0"
    for t in range(1, epochs + 1):
        steps.append(
            f"""pd{t} AS MATERIALIZED (
      SELECT tr.subj, tr.pred, tr.obj, tr.neg, d.j,
             h.val + r.val - tt.val AS pdiff,
             h.val + r.val - tn.val AS ndiff
      FROM trip tr CROSS JOIN dims d
      JOIN {pe} h ON h.id = tr.subj AND h.j = d.j
      JOIN {pr} r ON r.id = tr.pred AND r.j = d.j
      JOIN {pe} tt ON tt.id = tr.obj AND tt.j = d.j
      JOIN {pe} tn ON tn.id = tr.neg AND tn.j = d.j),
    ct{t} AS MATERIALIZED (
      SELECT p.*, CAST(sign(pdiff) AS INTEGER) AS sp,
             CAST(sign(ndiff) AS INTEGER) AS sn
      FROM pd{t} p SEMI JOIN (
        SELECT subj, pred, obj, neg FROM pd{t}
        GROUP BY 1, 2, 3, 4
        HAVING 1.0 + sum(abs(pdiff)) - sum(abs(ndiff)) > 0) a
      ON p.subj = a.subj AND p.pred = a.pred
         AND p.obj = a.obj AND p.neg = a.neg),
    ge{t} AS MATERIALIZED (
      SELECT id, j, sum(c) AS g FROM (
        SELECT subj AS id, j, -(sp - sn) AS c FROM ct{t}
        UNION ALL SELECT obj AS id, j, sp AS c FROM ct{t}
        UNION ALL SELECT neg AS id, j, -sn AS c FROM ct{t}) u
      GROUP BY 1, 2),
    gr{t} AS MATERIALIZED (
      SELECT pred AS id, j, sum(-(sp - sn)) AS g FROM ct{t} GROUP BY 1, 2),
    e{t} AS MATERIALIZED (
      SELECT e.id, e.j,
             greatest(-1.0, least(1.0,
               e.val + coalesce(g, 0) / {float(LR_DEN)!r})) AS val
      FROM {pe} e LEFT JOIN ge{t} ON e.id = ge{t}.id AND e.j = ge{t}.j),
    r{t} AS MATERIALIZED (
      SELECT r.id, r.j,
             greatest(-1.0, least(1.0,
               r.val + coalesce(g, 0) / {float(LR_DEN)!r})) AS val
      FROM {pr} r LEFT JOIN gr{t} ON r.id = gr{t}.id AND r.j = gr{t}.j)"""
        )
        pe, pr = f"e{t}", f"r{t}"
    return f"""
    WITH {links_cte},
    ents AS MATERIALIZED (SELECT DISTINCT id FROM (
      SELECT subj AS id FROM links UNION SELECT obj FROM links) u),
    vocab AS MATERIALIZED (SELECT id, row_number() OVER (ORDER BY id) - 1 AS idx
              FROM ents),
    nent AS MATERIALIZED (SELECT count(*) AS n FROM ents),
    dims AS (SELECT unnest(range(0, {dim})) AS j),
    tripidx AS MATERIALIZED (
      SELECT subj, pred, obj,
             {h60("'N|' || subj || '|' || pred || '|' || obj")}
               % (SELECT n FROM nent) AS nidx
      FROM (SELECT DISTINCT subj, pred, obj FROM links) l),
    trip AS MATERIALIZED (SELECT subj, pred, obj, v.id AS neg
             FROM tripidx JOIN vocab v ON v.idx = nidx),
    e0 AS MATERIALIZED (SELECT id, j, {init('E', 'id')} AS val FROM ents CROSS JOIN dims),
    r0 AS MATERIALIZED (SELECT id, j, {init('R', 'id')} AS val
           FROM (SELECT DISTINCT pred AS id FROM links) p CROSS JOIN dims),
    {','.join(steps)}
    SELECT kind, id, CAST(j AS INTEGER) AS j, val FROM (
      SELECT 'E' AS kind, id, j, val FROM e{epochs}
      UNION ALL SELECT 'R' AS kind, id, j, val FROM r{epochs}) z
    """
