"""KG verbalization: entity triples -> natural-language training text.

LLM training corpora routinely include verbalized knowledge-graph
facts ("KELM"-style: one short factual sentence per triple, grouped
per entity).  This operator turns the materialized triple table into
that corpus deterministically — same snapshot, same sentences, at any
parallelism — so the generated text can be content-addressed and
deduped like any other document source.  (No counterpart in
`/root/reference`, a parser library; pipeline-side derived training
data like `operators/walks.py` — SURVEY.md §2.2.)

Everything stays JVM-side: local-name extraction is a split, fact
ordering is ``sort_array`` over structs, sentence assembly is
``transform`` + ``concat_ws`` — zero Python in the path, so the
operator whole-stage-codegens and scales as one narrow pass after a
single per-subject aggregation (the same shuffle the entity-card
materialization already pays; at 100 TB the subject-hash-bucketed
triple table makes it Exchange-free).

Rendering rules (deliberately tiny and exact, so oracles can mirror
them): each fact becomes ``<subject-local> <predicate-local>
<object-rendered>.`` where ``*-local`` is the last ``/``- or
``#``-segment of the IRI with ``_`` -> space, an IRI object renders
as its local name, and a literal object renders in double quotes.
Facts are the SET view (graph semantics), sorted by (predicate,
object, objecttype), capped at ``max_facts``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["verbalize_entities"]


def _local(c: Column) -> Column:
    return F.replace(
        F.element_at(F.split(c, "[/#]"), -1), F.lit("_"), F.lit(" ")
    )


def verbalize_entities(triples: DataFrame, max_facts: int = 12) -> DataFrame:
    """Per-subject verbalized fact text.

    Returns ``(subject, n_facts, n_total_facts, n_tokens, text)``:
    ``n_total_facts`` counts every distinct fact of the subject,
    ``n_facts`` how many made it under the ``max_facts`` cap,
    ``n_tokens`` the whitespace token count of ``text`` (the unit the
    downstream packing operator budgets by).
    """
    facts = (
        triples.dropDuplicates(["subject", "predicate", "object", "objecttype"])
        .select(
            "subject",
            F.struct(
                F.col("predicate"), F.col("object"), F.col("objecttype")
            ).alias("fact"),
        )
    )
    cards = facts.groupBy("subject").agg(
        F.slice(F.sort_array(F.collect_list("fact")), 1, max_facts).alias("facts"),
        F.count("*").alias("n_total_facts"),
    )
    subj_loc = _local(F.col("subject"))
    sentence = F.concat_ws(
        " ",
        F.transform(
            F.col("facts"),
            lambda f: F.concat(
                subj_loc,
                F.lit(" "),
                _local(f["predicate"]),
                F.lit(" "),
                F.when(f["objecttype"] == "iri", _local(f["object"])).otherwise(
                    F.concat(F.lit('"'), f["object"], F.lit('"'))
                ),
                F.lit("."),
            ),
        ),
    )
    return cards.select(
        "subject",
        F.size("facts").alias("n_facts"),
        "n_total_facts",
        # explicit ASCII whitespace class: Java \s and Python \s
        # disagree on unicode whitespace inside literals, this doesn't
        F.size(F.split(sentence, "[ \t\n\r]+")).alias("n_tokens"),
        sentence.alias("text"),
    )
