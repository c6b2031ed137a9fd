"""Directory-based catalog (lake/catalog.py): HadoopCatalog-style
filesystem resolution plus the warehouse-wide maintenance sweep."""

import os

import pytest

from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images
from airbyte_spark.lake.catalog import (
    Catalog,
    NoSuchTableError,
    TableAlreadyExistsError,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _mk_images(cat, ident, spark, n=40, seed=1):
    t = cat.create_table(ident, IMAGES_SCHEMA, primary_key=["image_id"])
    t.append(generate_images(spark, n, num_partitions=2, seed=seed))
    return t


def test_lifecycle_and_listing(spark, cat):
    assert cat.list_tables() == []
    _mk_images(cat, "raw.images", spark)
    _mk_images(cat, "raw.thumbs", spark, seed=2)
    _mk_images(cat, "curated.deep.gold", spark, seed=3)
    assert cat.list_tables() == [
        "curated.deep.gold", "raw.images", "raw.thumbs",
    ]
    assert cat.list_tables("raw") == ["raw.images", "raw.thumbs"]
    assert cat.list_namespaces() == ["curated", "raw"]
    assert cat.table_exists("raw.images")
    assert not cat.table_exists("raw.nope")
    # load returns a working table rooted at the same path
    t = cat.load_table("raw.images")
    assert t.scan().count() == 40
    assert t.root == cat.table_path("raw.images")


def test_create_conflicts_and_bad_identifiers(spark, cat):
    _mk_images(cat, "ns.t", spark)
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("ns.t", IMAGES_SCHEMA, primary_key=["image_id"])
    with pytest.raises(NoSuchTableError):
        cat.load_table("ns.missing")
    for bad in ("", "a..b", "a/b", "a b", ("ns", "")):
        with pytest.raises(ValueError):
            cat.table_path(bad)


def test_drop_purge_vs_keep_data(spark, cat):
    t = _mk_images(cat, "ns.purged", spark)
    data_file = t.data_files()[0].path
    cat.drop_table("ns.purged", purge=True)
    assert not os.path.exists(cat.table_path("ns.purged"))

    t2 = _mk_images(cat, "ns.kept", spark, seed=2)
    kept_file = t2.data_files()[0].path
    cat.drop_table("ns.kept")  # metadata-only drop
    assert not cat.table_exists("ns.kept")
    assert os.path.exists(kept_file)  # data stays for external readers
    assert not os.path.exists(data_file)
    with pytest.raises(NoSuchTableError):
        cat.drop_table("ns.kept")


def test_maintain_all_sweeps_every_table(spark, cat):
    from airbyte_spark.operators.maintenance import MaintenanceReport

    _mk_images(cat, "a.t1", spark, n=30, seed=1)
    _mk_images(cat, "b.t2", spark, n=30, seed=2)
    # upsert batch for t1 only: same ids 0..9 re-generated (newer cursor)
    batch = generate_images(spark, 10, num_partitions=1, seed=9)
    reports = cat.maintain_all(
        "sweep1", sources={"a.t1": batch}, merge_mode="mor",
        max_concurrent=2,
    )
    assert set(reports) == {"a.t1", "b.t2"}
    assert all(isinstance(r, MaintenanceReport) for r in reports.values())
    # t1 absorbed the merge batch (PK-deduped), t2 just got maintained
    assert cat.load_table("a.t1").scan().count() == 30
    assert reports["a.t1"].stages["merge"]["rows"] == 10
    assert reports["b.t2"].stages["merge"].get("skipped")
    # each table ran on its own staging branch and swapped cleanly
    for ident in ("a.t1", "b.t2"):
        assert list(cat.load_table(ident).branches()) == ["main"]


def test_maintain_all_isolates_failures(spark, cat):
    _mk_images(cat, "ok.t", spark, n=20)
    _mk_images(cat, "bad.t", spark, n=20, seed=2)
    # poison bad.t: a merge source missing the PK column fails its pass
    bad_src = spark.createDataFrame([(1,)], "w int")
    reports = cat.maintain_all(
        "sweep2", sources={"bad.t": bad_src}, merge_mode="mor",
    )
    assert isinstance(reports["bad.t"], Exception)
    assert not isinstance(reports["ok.t"], Exception)
    assert cat.load_table("ok.t").scan().count() == 20
    # continue_on_error=False propagates instead
    with pytest.raises(Exception):
        cat.maintain_all(
            "sweep3", sources={"bad.t": bad_src},
            continue_on_error=False, max_concurrent=1,
        )
