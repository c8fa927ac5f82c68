"""Triple verbalization: KG → natural-language training text.

The reference stops at TSV triple dumps (compile_*.py); an LLM training
pipeline consumes the graph as TEXT — one sentence per triple, rendered
from a per-predicate template ("aspirin interacts with warfarin").
This operator is that export step.

Plan shape: the template table is predicate-vocabulary-sized (tens of
rows) and broadcast; rendering is two JVM-side string replaces per row
inside whole-stage codegen — no UDF, no shuffle beyond the scan. At
10^12 triples this is a map-only job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def verbalize_triples(
    triples: DataFrame,
    templates: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    fallback: str = "{subj} is related to {obj}",
) -> DataFrame:
    """Render one sentence per triple from per-predicate templates.

    ``templates``: (pred, template) rows; templates use the literal
    placeholders ``{subj}`` and ``{obj}``. Predicates without a template
    row render with ``fallback`` (left join + coalesce keeps every
    triple — a silent inner-join drop would under-export the graph).
    Output: (subj, pred, obj, text).
    """
    t = F.broadcast(templates.select(pred, F.col("template").alias("_tpl")))
    rendered = (
        triples.join(t, pred, "left")
        .withColumn("_tpl", F.coalesce(F.col("_tpl"), F.lit(fallback)))
        .select(
            subj,
            pred,
            obj,
            F.replace(
                F.replace(F.col("_tpl"), F.lit("{subj}"), F.col(subj)),
                F.lit("{obj}"),
                F.col(obj),
            ).alias("text"),
        )
    )
    return rendered
