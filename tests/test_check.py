"""`check` destination validation (CheckOperation.kt / S3DataLakeChecker.kt)."""

import glob
import os

from airbyte_spark.lake.check import check_destination


def test_check_succeeds_and_cleans_up(spark, tmp_table_dir):
    out = check_destination(spark, tmp_table_dir, namespace="ns1")
    assert out == {"status": "SUCCEEDED"}
    # probe table fully removed (S3DataLakeChecker.kt:96-104 try/finally)
    assert glob.glob(os.path.join(tmp_table_dir, "ns1", "_airbyte_check_*")) == []


def test_check_fails_with_message_on_unwritable_root(spark, tmp_table_dir):
    blocker = os.path.join(tmp_table_dir, "not_a_dir")
    with open(blocker, "w") as f:
        f.write("x")
    out = check_destination(spark, blocker)  # parent is a FILE
    assert out["status"] == "FAILED"
    assert out["message"]


def test_concurrent_checks_do_not_conflict(spark, tmp_table_dir):
    # UUID-suffixed probe names: two checks on one root both succeed
    assert check_destination(spark, tmp_table_dir)["status"] == "SUCCEEDED"
    assert check_destination(spark, tmp_table_dir)["status"] == "SUCCEEDED"
