"""Dirty-scoped (incremental) maintenance — r3 verdict top item: cluster
work must be O(change), not O(table).

Victim-selection semantics follow Iceberg rewrite_data_files (file-level
ops IcebergTableCleaner.kt:45-72; sort-order-on-write IcebergUtil.kt:
185-189; sort-order evolution on identifier change
IcebergTableSynchronizer.kt:314-378): a file is rewritten only when it is
unsorted under the current registered order, delete-affected past the
debt threshold, or under-sized with a packing gain. Clean files keep
their paths byte-identical across maintenance cycles."""

import pytest
from pyspark.sql import functions as F

from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images, generate_update_batch
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.cluster import cluster, select_cluster_victims
from airbyte_spark.operators.maintenance import (
    run_maintenance,
    run_partitioned_maintenance,
)

TARGET = 1024 * 1024


def _table(spark, root, n=120, partition_by=None, extra_props=None):
    t = LakeTable.create(
        spark,
        root,
        IMAGES_SCHEMA,
        primary_key=["image_id"],
        properties={"write.target-file-size-bytes": TARGET,
                    **(extra_props or {})},
        partition_by=partition_by,
    )
    t.append(generate_images(spark, n, num_partitions=4))
    return t


def _paths(t):
    return {e.path for e in t.data_files()}


def _content(t):
    return t.scan().select(
        F.expr("bit_xor(xxhash64(image_id, caption, w, h))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()


def _converge(t, job_prefix, **kw):
    """Run maintenance until the cluster stage is a no-op (the undersized
    gain test guarantees a fixed point within one extra pass)."""
    for i in range(3):
        rep = run_maintenance(t, f"{job_prefix}-{i}", merge_source=None, **kw)
        if not rep.stages["cluster"].get("rewritten_files"):
            return rep
    raise AssertionError("cluster victim selection did not converge")


def test_clean_table_second_pass_is_metadata_only(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    src = generate_update_batch(spark, 120, 20, num_partitions=4)
    run_maintenance(t, "pass1", merge_source=src, merge_mode="mor")
    _converge(t, "settle")
    before = _paths(t)
    rep = run_maintenance(t, "pass-noop", merge_source=None)
    m = rep.stages["cluster"]
    assert m["rewritten_files"] == 0 and m["rewritten_bytes"] == 0
    assert m["skipped_files"] == len(before)
    assert rep.stages["rewrite-manifests"].get("skipped")
    assert _paths(t) == before  # clean files byte-identical (same paths)


def test_dirty_batch_rewrites_only_changed_bytes(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    run_maintenance(t, "pass1", merge_source=None)
    _converge(t, "settle")
    clean = _paths(t)
    total_bytes = sum(e.bytes for e in t.data_files())
    # one small MoR micro-batch: a few updates + inserts. r6: the merge
    # stage writes its data files ALREADY curve-sorted and stamped
    # (merge_into sort_spec), so the cluster stage skips them too — the
    # steady pass rewrites nothing at all unless packing/level policy
    # kicks in.
    src = generate_update_batch(spark, 120, 6, num_partitions=2)
    rep = run_maintenance(t, "pass2", merge_source=src, merge_mode="mor")
    m = rep.stages["cluster"]
    # O(change): the pass must not rewrite the clean bulk of the table
    assert m["rewritten_bytes"] < 0.5 * total_bytes
    assert m["skipped_files"] > 0
    # clean files survive with their exact paths, except any absorbed by
    # the undersized packing gain (the merge's small new file can recruit
    # a small clean partner)
    lost = clean - _paths(t)
    assert not lost or m["victim_reasons"]["undersized"] >= len(lost)
    # the dirty pass absorbed any small packing partners (undersized gain
    # counts files already being rewritten), so the very next no-change
    # pass is metadata-only — no settle loop needed
    rep3 = run_maintenance(t, "pass3", merge_source=None)
    assert rep3.stages["cluster"]["rewritten_files"] == 0


def test_maintenance_merge_writes_sort_stamped_files(spark, tmp_table_dir):
    """r6 sorted write: run_maintenance's merge emits data files stamped
    with the registered sort order, so the cluster stage's 'unsorted'
    criterion never selects them (truthfulness of the stamp is pinned by
    test_merge_sort_spec_writes_curve_sorted_files)."""
    t = _table(spark, tmp_table_dir)
    run_maintenance(t, "pass1", merge_source=None)
    _converge(t, "settle")
    clean = _paths(t)
    src = generate_update_batch(spark, 120, 10, num_partitions=2)
    rep = run_maintenance(t, "pass2", merge_source=src, merge_mode="mor")
    order_id = t.ensure_sort_order(["phash", "w", "h"], "zorder", 21)
    new_files = [e for e in t.data_files() if e.path not in clean]
    assert new_files, "merge should have added data files"
    assert all(e.sort_order_id == order_id for e in new_files)
    # none of the merge's files were cluster victims this pass
    assert rep.stages["cluster"]["victim_reasons"].get("unsorted", 0) == 0


def test_merge_sort_spec_writes_curve_sorted_files(spark, tmp_table_dir):
    """merge_into(sort_spec=...) on an empty table: dim bounds fall back
    to the batch's own min/max, so the expected curve key is exactly
    reproducible — every output file must be non-decreasing in it and
    stamped with the order id."""
    import numpy as np

    from airbyte_spark.functions.curves import phash_to_unsigned, zorder_key
    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.merge import merge_into
    from airbyte_spark.datagen import IMAGES_SCHEMA

    t = LakeTable.create(
        spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"],
        properties={"write.target-file-size-bytes": 256 * 1024},
    )
    dims = ["phash", "w", "h"]
    order_id = t.ensure_sort_order(dims, "zorder", 21)
    src = generate_images(spark, 300, num_partitions=4)
    merge_into(t, src, mode="mor", sort_spec={
        "dims": dims, "curve": "zorder", "bits": 21, "order_id": order_id,
    })
    entries = t.data_files()
    assert entries and all(e.sort_order_id == order_id for e in entries)
    # reproduce the key: bounds = batch-wide min/max per dim (phash via the
    # unsigned flip), quantized at 21 bits — same math as curve_key_udf
    pdf_all = src.select(*dims).toPandas()
    bounds = []
    for d in dims:
        a = pdf_all[d].to_numpy()
        # production bounds round-trip through float() (manifest stats /
        # the fallback agg return floats) BEFORE the phash flip — mirror
        # that exactly or quantization-bin edges differ
        raw_lo, raw_hi = float(a.min()), float(a.max())
        if "phash" in d:
            lo = float(phash_to_unsigned(np.array([int(raw_lo)], dtype=np.int64))[0])
            hi = float(phash_to_unsigned(np.array([int(raw_hi)], dtype=np.int64))[0])
            bounds.append((min(lo, hi), max(lo, hi)))
        else:
            bounds.append((raw_lo, raw_hi))
    checked = 0
    for e in entries:
        pdf = spark.read.parquet(e.path).select(*dims).toPandas()
        if len(pdf) < 2:
            continue
        arrays = []
        for d in dims:
            a = pdf[d].to_numpy()
            if "phash" in d:
                a = phash_to_unsigned(a.astype(np.int64)).astype(np.float64)
            arrays.append(np.nan_to_num(a.astype(np.float64), nan=0.0))
        keys = zorder_key(arrays, bounds, bits=21)
        assert (np.diff(keys) >= 0).all(), f"{e.path} not sorted by curve key"
        checked += 1
    assert checked > 0


def test_dirty_and_full_scope_converge_to_identical_state(spark, tmp_table_dir):
    import os

    roots = {s: os.path.join(tmp_table_dir, s) for s in ("dirty", "full")}
    tables = {}
    for scope, root in roots.items():
        t = _table(spark, root)
        for i in range(2):
            src = generate_update_batch(spark, 120, 15, seed=80 + i,
                                        num_partitions=2)
            run_maintenance(
                t, f"{scope}-{i}", merge_source=src, merge_mode="mor",
                cluster_scope=scope,
            )
        tables[scope] = t
    a, b = tables["dirty"], tables["full"]
    assert _content(a) == _content(b)
    # and a row-level diff (both directions) over the full payload
    cols = [f.name for f in IMAGES_SCHEMA.fields if f.name != "bytes"]
    assert a.scan().select(cols).exceptAll(b.scan().select(cols)).count() == 0
    assert b.scan().select(cols).exceptAll(a.scan().select(cols)).count() == 0


def test_delete_debt_below_threshold_keeps_deletes_live(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    run_maintenance(t, "pass1", merge_source=None)
    _converge(t, "settle")
    clean = _paths(t)
    from airbyte_spark.operators.merge import merge_into

    src = generate_update_batch(spark, 120, 8, num_partitions=2)
    merge_into(t, src, mode="mor")
    assert t.delete_files()  # 1 era of debt, threshold is 8
    res = cluster(t, scope="dirty", target_file_bytes=TARGET)
    # only the merge's new insert files were rewritten; the debt stays as
    # MoR delete files (scan-side anti-join keeps reads correct)
    assert res.victim_reasons["delete-hit"] == 0
    assert t.delete_files()
    # clean files survive except any consolidated by the undersized gain
    lost = clean - _paths(t)
    assert not lost or res.victim_reasons["undersized"] >= len(lost)
    # forcing the fold retires the debt and drops the delete files
    res2 = cluster(t, scope="dirty", target_file_bytes=TARGET,
                   fold_deletes="always")
    assert res2.dropped_delete_files > 0
    assert not t.delete_files()


def test_delete_era_threshold_triggers_auto_fold(spark, tmp_table_dir):
    # threshold 2 so 3 MoR batches cross it; the merge's own auto-fold is
    # disabled so the cluster-side policy is what retires the debt
    t = _table(spark, tmp_table_dir, n=60, extra_props={
        "cluster.max-delete-eras": 2,
        "merge.mor.max-delete-eras": 0,
    })

    from airbyte_spark.operators.merge import merge_into

    run_maintenance(t, "pass1", merge_source=None)
    _converge(t, "settle")
    for i in range(3):
        merge_into(t, generate_update_batch(spark, 60, 5, seed=90 + i,
                                            num_partitions=2), mode="mor")
    assert len({d.sequence for d in t.delete_files()}) == 3  # > threshold 2
    res = cluster(t, scope="dirty", target_file_bytes=TARGET)
    assert res.victim_reasons["delete-hit"] > 0
    assert not t.delete_files()


def test_pk_change_invalidates_sort_order(spark, tmp_table_dir):
    """testDedupChangePk's table-side half: an identifier change rebuilds
    the sort order, so EVERY previously clustered file reads as dirty
    (IcebergTableSynchronizer.kt:314-378)."""
    t = _table(spark, tmp_table_dir, n=60)
    run_maintenance(t, "pass1", merge_source=None)
    _converge(t, "settle")
    entries = t.data_files()
    assert all(e.sort_order_id for e in entries)
    t.evolve_schema(t.schema(), new_primary_key=["image_id", "fmt"])
    order_id = t.ensure_sort_order(["phash", "w", "h"], "zorder", 21)
    victims, reasons = select_cluster_victims(
        t, t.data_files(), [], order_id, TARGET
    )
    assert len(victims) == len(entries)
    assert reasons["unsorted"] == len(entries)


def test_sort_dim_change_dirties_every_file(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, n=60)
    cluster(t, dims=["phash", "w", "h"], target_file_bytes=TARGET)
    res = cluster(t, dims=["w", "h"], scope="dirty", target_file_bytes=TARGET)
    assert res.rewritten_files == res.files_before
    assert res.victim_reasons["unsorted"] == res.files_before


def test_partitioned_maintenance_skips_clean_partitions(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, n=120, partition_by=["fmt"])
    run_partitioned_maintenance(t, "pass1", cluster_dims=["phash", "w", "h"],
                                target_file_bytes=TARGET)
    # settle the undersized gain condition, then confirm a no-op pass
    for i in range(3):
        rep = run_partitioned_maintenance(
            t, f"settle-{i}", cluster_dims=["phash", "w", "h"],
            target_file_bytes=TARGET,
        )
        if rep.stages["summary"]["dirty_partitions"] == 0:
            break
    before = _paths(t)
    rep2 = run_partitioned_maintenance(
        t, "noop", cluster_dims=["phash", "w", "h"], target_file_bytes=TARGET
    )
    assert rep2.stages["summary"]["dirty_partitions"] == 0
    assert rep2.stages["summary"]["skipped_partitions"] == 2  # png + jpeg
    assert _paths(t) == before
    # dirty ONE partition (png-only append) -> only that partition rewrites
    png = generate_images(spark, 40, seed=7, id_offset=1000,
                          num_partitions=2).filter(F.col("fmt") == "png")
    t.append(png)
    with_new = _paths(t)
    rep3 = run_partitioned_maintenance(
        t, "png-dirty", cluster_dims=["phash", "w", "h"],
        target_file_bytes=TARGET,
    )
    assert rep3.stages["summary"]["dirty_partitions"] == 1
    part_stage = [v for k, v in rep3.stages.items() if k.startswith("partition-")]
    assert len(part_stage) == 1 and part_stage[0]["partition"] == {"fmt": "png"}
    # every jpeg file kept its path
    jpeg_before = {
        e.path for e in t.data_files() if e.partition.get("fmt") == "jpeg"
    }
    assert jpeg_before <= with_new


def test_invalid_modes_raise(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, n=10)
    with pytest.raises(ValueError, match="compact_mode"):
        run_maintenance(t, "bad", compact_mode="alway")
    with pytest.raises(ValueError, match="cluster_scope"):
        run_maintenance(t, "bad2", cluster_scope="incremental")
    with pytest.raises(ValueError, match="compact_mode"):
        run_partitioned_maintenance(t, "bad3", compact_mode="alway")
    with pytest.raises(ValueError, match="scope"):
        cluster(t, scope="partial")
    with pytest.raises(ValueError, match="fold_deletes"):
        cluster(t, fold_deletes="sometimes")


def test_level_compaction_bounds_overlapping_passes(spark, tmp_table_dir):
    """Each dirty pass commits one overlapping sorted "level"; past
    cluster.max-sorted-levels the next pass consolidates the partition,
    bounding read amplification like LSM leveling."""
    small_target = 64 * 1024  # batch files land ABOVE the undersized ratio
    t = _table(spark, tmp_table_dir, n=40, extra_props={
        "cluster.max-sorted-levels": 2,
    })
    cluster(t, scope="dirty", target_file_bytes=small_target)  # level 1
    for i in range(2):
        t.append(generate_images(spark, 10, seed=10 + i,
                                 id_offset=2000 + 100 * i, num_partitions=1))
        res = cluster(t, scope="dirty", target_file_bytes=small_target)
        assert res.victim_reasons.get("level-compaction", 0) == 0
        assert res.skipped_files > 0  # incremental, not a full rewrite
    # clean sorted files now span 3 levels > threshold 2 -> consolidation
    t.append(generate_images(spark, 10, seed=30, id_offset=3000,
                             num_partitions=1))
    res = cluster(t, scope="dirty", target_file_bytes=small_target)
    assert res.victim_reasons.get("level-compaction", 0) > 0
    assert res.rewritten_files == res.files_before
    assert len({e.sequence for e in t.data_files()}) == 1  # one level again


def test_fold_enforces_the_carried_sort_order(spark, tmp_table_dir):
    """The delete fold's repartition shuffle does NOT preserve intra-file
    row order, so rewrite_deletes re-sorts every bin by the victim's
    registered curve key before the write — the carried sort_order_id
    stamp is then true by construction. Without the sort, a folded file
    could read as clean forever while internally unsorted (ADVICE r4),
    silently degrading row-group pruning."""
    import numpy as np
    import pyarrow.parquet as pq

    from airbyte_spark.functions.curves import phash_to_unsigned, zorder_key
    from airbyte_spark.operators.deletes import rewrite_deletes
    from airbyte_spark.operators.merge import merge_into

    t = _table(spark, tmp_table_dir, n=240)
    cluster(t, target_file_bytes=TARGET)
    before = {e.path: e for e in t.data_files()}
    assert all(e.sort_order_id for e in before.values())
    merge_into(
        t,
        generate_update_batch(spark, 240, 24, seed=7, num_partitions=2),
        mode="mor",
    )
    res = rewrite_deletes(t)
    assert res.rewritten_files > 0
    after = t.data_files()
    folded = [
        e for e in after if e.path not in before and e.sort_order_id
    ]
    victims = [before[p] for p in set(before) - {e.path for e in after}]
    assert folded and victims
    oid = victims[0].sort_order_id
    assert all(e.sort_order_id == oid for e in victims)
    # the fold carries the stamp (no re-cluster next cycle)...
    assert len(folded) == len(victims)
    # ...and the files genuinely satisfy it: recompute the curve key the
    # way the fold does (bounds over the victim group's stats) and check
    # each folded file is internally non-decreasing in it
    spec = t.sort_orders()[oid]
    dims, bits = spec["dims"], spec["bits"]
    assert spec["curve"] == "zorder"
    bounds = []
    for d in dims:
        lo = min(float(e.stats[d]["min"]) for e in victims)
        hi = max(float(e.stats[d]["max"]) for e in victims)
        if "phash" in d:
            lo2 = float(phash_to_unsigned(np.array([int(lo)], dtype=np.int64))[0])
            hi2 = float(phash_to_unsigned(np.array([int(hi)], dtype=np.int64))[0])
            lo, hi = min(lo2, hi2), max(lo2, hi2)
        bounds.append((lo, hi))
    for e in folded:
        cols = pq.read_table(e.path, columns=dims)
        arrays = []
        for d in dims:
            a = np.asarray(cols[d].to_pandas(), dtype=np.float64)
            if "phash" in d:
                a = phash_to_unsigned(
                    np.asarray(cols[d].to_pandas(), dtype=np.int64)
                ).astype(np.float64)
            arrays.append(np.nan_to_num(a))
        keys = zorder_key(arrays, bounds, bits=bits)
        assert (np.diff(keys) >= 0).all(), f"unsorted fold output {e.path}"


def _four_criteria_state(spark, root, thresh=None):
    """Unpartitioned table whose metadata exercises every victim
    criterion: sorted seq-A files (delete-hit), a small sorted seq-B file
    (undersized / level-compaction fodder), fresh unsorted appends, MoR
    delete files."""
    import os

    from airbyte_spark.operators.merge import merge_into

    props = {"write.target-file-size-bytes": TARGET}
    if thresh is not None:
        props["cluster.planning.distributed-threshold"] = thresh
    t = LakeTable.create(
        spark, root, IMAGES_SCHEMA, primary_key=["image_id"], properties=props
    )
    t.append(generate_images(spark, 240, num_partitions=4))
    cluster(t, target_file_bytes=TARGET)  # sorted @ seq A
    t.append(generate_images(spark, 12, id_offset=10_000, num_partitions=2))
    cluster(t, scope="dirty", target_file_bytes=TARGET)  # absorb @ seq B
    t.append(generate_images(spark, 12, id_offset=20_000, num_partitions=2))
    cluster(t, scope="dirty", target_file_bytes=TARGET)  # small sorted @ C
    t.append(generate_images(spark, 12, id_offset=30_000, num_partitions=2))
    merge_into(
        t,
        generate_update_batch(spark, 240, 24, seed=11, num_partitions=2),
        mode="mor",
    )
    return t


def test_distributed_victims_match_driver(spark, tmp_table_dir):
    """r4 verdict top item: past cluster.planning.distributed-threshold
    the victim predicates run over executor-parsed manifest entries — on
    an UNPARTITIONED table too — and must select EXACTLY the driver
    selector's victims (paths + reason counts + totals), across configs
    that exercise all four criteria."""
    from airbyte_spark.operators.cluster import (
        select_cluster_victims,
        select_cluster_victims_distributed,
    )

    t = _four_criteria_state(spark, tmp_table_dir)
    entries = t.data_files()
    deletes = t.delete_files()
    assert deletes
    order_id = t.ensure_sort_order(["phash", "w", "h"], "zorder", 21)
    for fold, levels in ((True, 0), (False, 1), (True, 8)):
        dv, dr = select_cluster_victims(
            t, entries, deletes, order_id, TARGET,
            fold_deletes=fold, max_sorted_levels=levels,
        )
        xv, xr, files_before, bytes_before = (
            select_cluster_victims_distributed(
                t, deletes, order_id, TARGET,
                fold_deletes=fold, max_sorted_levels=levels,
            )
        )
        assert {e.path for e in xv} == {e.path for e in dv}, (fold, levels)
        assert xr == dr, (fold, levels)
        assert files_before == len(entries)
        assert bytes_before == sum(e.bytes for e in entries)
    # every criterion fires somewhere across the compared configs
    _, r_fold = select_cluster_victims(
        t, entries, deletes, order_id, TARGET,
        fold_deletes=True, max_sorted_levels=0,
    )
    assert r_fold["unsorted"] >= 1 and r_fold["delete-hit"] >= 1
    _, r_lvl = select_cluster_victims(
        t, entries, deletes, order_id, TARGET,
        fold_deletes=False, max_sorted_levels=1,
    )
    assert r_lvl["undersized"] >= 1 and r_lvl["level-compaction"] >= 1


def test_dirty_cluster_distributed_end_to_end(spark, tmp_table_dir):
    """cluster(scope='dirty') past the planning threshold (threshold=0)
    makes the same rewrite decisions and converges to the same scan state
    as the driver-planned pass, unpartitioned."""
    import os

    res = {}
    content = {}
    for name, thresh in (("driver", 10**9), ("dist", 0)):
        t = _four_criteria_state(
            spark, os.path.join(tmp_table_dir, name), thresh=thresh
        )
        r = cluster(
            t, scope="dirty", target_file_bytes=TARGET, fold_deletes="always"
        )
        res[name] = r
        content[name] = _content(t)
    assert res["dist"].victim_reasons == res["driver"].victim_reasons
    assert res["dist"].rewritten_files == res["driver"].rewritten_files
    assert res["dist"].files_before == res["driver"].files_before
    assert res["dist"].dropped_delete_files == res["driver"].dropped_delete_files
    assert content["dist"] == content["driver"]
