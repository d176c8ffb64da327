"""End-to-end pipeline + manifest resume + distributed serializer."""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import functions as F

from turtle_spark.core.parser import parse_triples
from turtle_spark.operators.serialize import subject_blocks, turtle_text
from turtle_spark.plans.manifest import StageManifest, dataframe_fingerprint
from turtle_spark.plans.pipeline import run_pipeline
from turtle_spark.sources.corpus import generate_docs
from turtle_spark.sources.storage import read_subject, write_triples


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    generate_docs(spark, 30, seed=9).write.parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    wd = str(tmp_path / "work")
    r1 = run_pipeline(spark, docs, wd, input_fingerprint="corpus-v1", n_buckets=8)
    n1 = r1.triples.count()
    assert n1 > 0
    assert r1.stages_resumed == []
    assert set(r1.metrics) == {
        "extract", "terms", "edges", "components",
        "canonical_map", "canonical_triples", "materialize",
    }

    # second run with same fingerprint: every stage resumes from manifest
    r2 = run_pipeline(spark, docs, wd, input_fingerprint="corpus-v1", n_buckets=8)
    assert len(r2.stages_resumed) == 7
    assert r2.triples.count() == n1

    # changed fingerprint: stages recompute
    r3 = run_pipeline(spark, docs, wd, input_fingerprint="corpus-v2", n_buckets=8)
    assert r3.stages_resumed == []
    assert r3.triples.count() == n1

    # manifest files carry lineage + metrics
    rec = json.load(open(f"{wd}/extract.manifest.json"))
    assert rec["status"] == "committed" and rec["rows"] > 0
    assert rec["fingerprint"] == "corpus-v2"


def test_manifest_partial_resume(spark, tmp_path):
    """A stage whose manifest is missing recomputes; committed ones don't."""
    m = StageManifest(tmp_path / "wd")
    df = spark.range(10).select(F.col("id").cast("long"))
    calls = []

    def compute():
        calls.append(1)
        return df

    out1, resumed1 = m.load_or_compute(spark, "s1", "fp", compute)
    out2, resumed2 = m.load_or_compute(spark, "s1", "fp", compute)
    assert (resumed1, resumed2) == (False, True)
    assert len(calls) == 1
    assert out2.count() == 10
    # fingerprint change invalidates
    _, resumed3 = m.load_or_compute(spark, "s1", "fp2", compute)
    assert resumed3 is False and len(calls) == 2


def test_dataframe_fingerprint_partition_invariant(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("x"))
    assert dataframe_fingerprint(df) == dataframe_fingerprint(df.repartition(13))


def test_bucketed_storage_prunes(spark, tmp_path):
    triples = spark.createDataFrame(
        [("d", 0, f"http://e/s{i}", "http://e/p", f"o{i}", "", "", "literal") for i in range(50)],
        "doc_id string, seq long, subject string, predicate string, object string, label string, datatype string, objecttype string",
    )
    path = str(tmp_path / "triples")
    write_triples(triples, path, n_buckets=8)
    hit = read_subject(spark, path, "http://e/s7", n_buckets=8)
    rows = hit.collect()
    assert len(rows) == 1 and rows[0].object == "o7"
    # partition filter must reach the scan
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket" in plan


def test_subject_blocks_match_core_serializer(spark):
    triples = spark.createDataFrame(
        [
            ("d", 0, "http://e/a", "http://e/b", "c", "", "", "literal"),
            ("d", 1, "http://e/a", "http://e/b", "d", "", "", "literal"),
            ("d", 2, "http://e/a", "http://e/e", "c", "", "", "literal"),
            ("d", 3, "http://e/z", "http://e/p", "http://e/q", "", "", "iri"),
            ("d", 4, "http://e/z", "http://e/p", "http://e/q", "", "", "iri"),  # dup
        ],
        "doc_id string, seq long, subject string, predicate string, object string, label string, datatype string, objecttype string",
    )
    text = turtle_text(triples)
    assert text == (
        '<http://e/a> \n\t<http://e/b> "c", "d" ;\n\t<http://e/e> "c" .\n'
        "<http://e/z> <http://e/p> <http://e/q> .\n"
    )
    # round-trip through the parser
    reparsed = parse_triples(text)
    assert ("http://e/z", "http://e/p", "http://e/q") in {t[:3] for t in reparsed}


def test_turtle_text_with_pragmas_roundtrip(spark):
    triples = spark.createDataFrame(
        [("d", 0, "http://base.example/x", "http://base.example/p", "v", "", "", "literal")],
        "doc_id string, seq long, subject string, predicate string, object string, label string, datatype string, objecttype string",
    )
    text = turtle_text(triples, base="http://base.example/")
    assert text.startswith("@base <http://base.example/> .\n")
    reparsed = parse_triples(text)
    assert reparsed[0][:3] == ("http://base.example/x", "http://base.example/p", "v")


def test_pipeline_canonicalizes_near_duplicate_iris(spark, tmp_path):
    # two docs refer to nearly identical subject IRIs -> one canonical subject
    docs = spark.createDataFrame(
        [
            ("d1", [{"kind": "text", "text": '<http://e/person/Jonathan_Smithson> <http://e/claims> "a" .', "media_ref": "", "offset": 0}]),
            ("d2", [{"kind": "text", "text": '<http://e/person/Jonathan_Smithsen> <http://e/claims> "b" .', "media_ref": "", "offset": 0}]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    r = run_pipeline(
        spark, docs, str(tmp_path / "wd"), input_fingerprint="x",
        n_buckets=4, link_threshold=0.6,
    )
    subs = {row.subject for row in r.triples.select("subject").collect()}
    assert subs == {"http://e/person/Jonathan_Smithsen"}  # lexicographic min wins


def test_chunked_extract_partition_resume(spark, tmp_path):
    """Partition-granular resume: committed extraction chunks are not
    recomputed; results equal the unchunked stage; manifests carry
    per-partition lineage."""
    from turtle_spark.plans.manifest import StageManifest
    from turtle_spark.plans.pipeline import chunked_extract

    docs = generate_docs(spark, 60, seed=5)
    wd = str(tmp_path / "wd")
    manifest = StageManifest(wd)

    # first run: nothing resumed
    df1, resumed1 = chunked_extract(spark, docs, manifest, "fp-1", n_chunks=4)
    assert resumed1 == []
    n1 = df1.count()

    # simulate a crash after commit: second run resumes EVERY chunk
    df2, resumed2 = chunked_extract(spark, docs, manifest, "fp-1", n_chunks=4)
    assert len(resumed2) == 4
    assert df2.count() == n1

    # wipe one chunk's manifest -> exactly that chunk recomputes
    (pathlib.Path(wd) / "extract_chunk_0002.manifest.json").unlink()
    df3, resumed3 = chunked_extract(spark, docs, manifest, "fp-1", n_chunks=4)
    assert sorted(resumed3) == [
        "extract_chunk_0000", "extract_chunk_0001", "extract_chunk_0003",
    ]
    assert df3.count() == n1

    # chunked union == unchunked extraction (same triples)
    from turtle_spark.operators.canonicalize import globalize_blank_nodes
    from turtle_spark.operators.extract import extract_triples, media_triples

    plain = globalize_blank_nodes(
        extract_triples(docs).unionByName(media_triples(docs))
    )
    assert df3.exceptAll(plain).count() == 0
    assert plain.exceptAll(df3).count() == 0

    # manifest records per-partition lineage
    rec = manifest.read("extract_chunk_0000")
    assert rec["status"] == "committed"
    assert rec["partitions"] == len(rec["partition_lineage"])
    assert sum(e["rows"] for e in rec["partition_lineage"]) == rec["rows"]


def test_pipeline_publishes_snapshot_idempotently(spark, tmp_path):
    """With snapshot_dir set, the pipeline publishes its canonical
    table to the snapshot catalog exactly once per input fingerprint:
    a resumed re-run reuses the published version; a new fingerprint
    appends version 2, and the catalog's time travel still serves v1."""
    from turtle_spark.sources.snapshots import SnapshotCatalog

    docs = generate_docs(spark, 20, seed=11)
    wd = str(tmp_path / "work")
    sd = str(tmp_path / "snaps")

    r1 = run_pipeline(
        spark, docs, wd, input_fingerprint="fp-1", n_buckets=8, snapshot_dir=sd
    )
    assert r1.metrics["snapshot"] == {"version": 1, "resumed": False}
    cat = SnapshotCatalog(sd)
    v1_rows = cat.read(spark, 1).count()
    assert v1_rows == r1.triples.count()

    # same fingerprint -> no second snapshot
    r2 = run_pipeline(
        spark, docs, wd, input_fingerprint="fp-1", n_buckets=8, snapshot_dir=sd
    )
    assert r2.metrics["snapshot"] == {"version": 1, "resumed": True}
    assert cat.current_version() == 1

    # new fingerprint -> append; v1 unchanged under the new current
    r3 = run_pipeline(
        spark, docs, wd, input_fingerprint="fp-2", n_buckets=8, snapshot_dir=sd
    )
    assert r3.metrics["snapshot"] == {"version": 2, "resumed": False}
    assert cat.read(spark, 1).count() == v1_rows
    assert cat.read(spark).count() == 2 * v1_rows
    assert cat.snapshot(2).properties["input_fingerprint"] == "fp-2"
