"""Remote-filesystem config surface (≙ reference ``filesystem/fs.py:7-139``,
``filesystem/_aws.py:6-98``): protocol/profile kwargs must land as Hadoop
connector confs on the live session, and compat paths must compose the
connector URI. No object store exists in this runtime, so the assertions
stop at conf/path composition — the IO itself is the connector's job.
"""

from __future__ import annotations

import os

import pytest

from pydatalake_spark.compat import Reader, Writer
from pydatalake_spark.sources.filesystem import (
    canonical_scheme,
    configure_filesystem,
    load_aws_profile,
    remote_uri,
)


def _hconf(spark, key):
    return spark.sparkContext._jsc.hadoopConfiguration().get(key)


@pytest.fixture(autouse=True)
def _restore_hadoop_conf(spark):
    """The session (and its hadoopConfiguration) is shared across the test
    module — snapshot the keys these tests touch and restore them so a
    configured fs.defaultFS/credential never leaks into other tests."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    keys = [
        "fs.defaultFS",
        "fs.s3a.access.key",
        "fs.s3a.secret.key",
        "fs.s3a.session.token",
        "fs.s3a.endpoint",
        "fs.s3a.endpoint.region",
        "fs.s3a.path.style.access",
        "fs.s3a.aws.credentials.provider",
        "fs.gs.auth.type",
        "fs.gs.auth.service.account.json.keyfile",
        "fs.gs.project.id",
        "fs.azure.account.key.acct.dfs.core.windows.net",
    ]
    before = {k: hconf.get(k) for k in keys}
    yield
    for k, v in before.items():
        if v is None:
            hconf.unset(k)
        else:
            hconf.set(k, v)


def test_s3_confs_land_on_session(spark):
    confs = configure_filesystem(
        spark,
        "s3",
        key="AKTEST",
        secret="SHHH",
        endpoint_url="http://localhost:9000",
        region="us-east-1",
    )
    assert confs["fs.s3a.access.key"] == "AKTEST"
    assert _hconf(spark, "fs.s3a.access.key") == "AKTEST"
    assert _hconf(spark, "fs.s3a.secret.key") == "SHHH"
    assert _hconf(spark, "fs.s3a.endpoint") == "http://localhost:9000"
    assert _hconf(spark, "fs.s3a.path.style.access") == "true"
    assert _hconf(spark, "fs.s3a.endpoint.region") == "us-east-1"


def test_s3_session_token_switches_provider(spark):
    confs = configure_filesystem(spark, "s3", key="a", secret="b", token="c")
    assert confs["fs.s3a.aws.credentials.provider"].endswith(
        "TemporaryAWSCredentialsProvider"
    )


def test_aws_profile_resolution(spark, tmpdir_path):
    creds = os.path.join(tmpdir_path, "credentials")
    with open(creds, "w") as f:
        f.write(
            "[lake]\n"
            "aws_access_key_id = PROF_KEY\n"
            "aws_secret_access_key = PROF_SECRET\n"
        )
    assert load_aws_profile("lake", creds)["aws_access_key_id"] == "PROF_KEY"
    confs = configure_filesystem(
        spark, "s3", profile="lake", credentials_file=creds
    )
    assert confs["fs.s3a.access.key"] == "PROF_KEY"
    assert confs["fs.s3a.secret.key"] == "PROF_SECRET"
    with pytest.raises(ValueError, match="not found"):
        load_aws_profile("absent", creds)


def test_gcs_azure_hdfs_confs(spark):
    assert configure_filesystem(spark, "gcs", keyfile="/k.json", project="p") == {
        "fs.gs.auth.type": "SERVICE_ACCOUNT_JSON_KEYFILE",
        "fs.gs.auth.service.account.json.keyfile": "/k.json",
        "fs.gs.project.id": "p",
    }
    az = configure_filesystem(
        spark, "az", account_name="acct", account_key="k123"
    )
    assert az == {"fs.azure.account.key.acct.dfs.core.windows.net": "k123"}
    hd = configure_filesystem(spark, "hdfs", host="nn1", port=9000)
    assert hd == {"fs.defaultFS": "hdfs://nn1:9000"}
    with pytest.raises(ValueError, match="unsupported protocol"):
        canonical_scheme("ftp")


def test_remote_uri_composition():
    assert remote_uri("data/t", "mybucket", "s3") == "s3a://mybucket/data/t"
    assert remote_uri("s3://b/data", None, None) == "s3a://b/data"
    assert remote_uri("data/t", "b", "gcs") == "gs://b/data/t"
    assert remote_uri("data/t", "b", None) == "b/data/t"
    assert remote_uri("/local/p", None, "local") == "/local/p"


def test_reader_writer_wire_protocol_through(spark):
    r = Reader(
        "lake/orders",
        bucket="warehouse",
        protocol="s3",
        storage_options={"key": "RK", "secret": "RS"},
        spark=spark,
    )
    assert r.path == "s3a://warehouse/lake/orders"
    assert _hconf(spark, "fs.s3a.access.key") == "RK"
    w = Writer(
        "lake/out",
        bucket="warehouse",
        protocol="s3",
        storage_options={"key": "WK", "secret": "WS"},
        spark=spark,
    )
    assert w.path == "s3a://warehouse/lake/out"
    assert _hconf(spark, "fs.s3a.access.key") == "WK"
