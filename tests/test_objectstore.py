"""S3-compatible object storage (reference src/storage/s3.rs).

Three layers, each proven separately:
- SigV4 signing against the published AWS worked example;
- client <-> MiniS3Server protocol e2e where the SERVER verifies every
  signature by recomputation (wrong secret / tampered body => 403);
- S3Metastore hosting ALL engine metadata through the metastore seam
  (the object_store_metastore.rs arrangement), full server lifecycle.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest

from parseable_spark.metastore import set_metastore
from parseable_spark.storage.objectstore import (
    MiniS3Server,
    S3Client,
    S3Config,
    S3Error,
    S3Metastore,
    canonical_query,
    data_root_uri,
    require_s3a,
    s3a_spark_conf,
    sign_request,
    uri_encode,
)

CREDS = {"AKIDTEST": "sekritsekrit"}


@pytest.fixture(scope="module")
def mini():
    srv = MiniS3Server(CREDS).start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def client(mini):
    return S3Client(
        S3Config(
            endpoint_url=mini.endpoint_url,
            bucket="parseable",
            access_key="AKIDTEST",
            secret_key=CREDS["AKIDTEST"],
        )
    )


# -- signing ---------------------------------------------------------------


def test_sigv4_matches_aws_published_example():
    """The worked example from the AWS General Reference sigv4 docs
    (GET https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08,
    20150830T123600Z, us-east-1/iam) — pins the whole derivation:
    canonical request, string-to-sign, key chain, final signature."""
    auth = sign_request(
        method="GET",
        canonical_uri="/",
        query=canonical_query(
            [("Action", "ListUsers"), ("Version", "2010-05-08")]
        ),
        headers={
            "content-type": "application/x-www-form-urlencoded; charset=utf-8",
            "host": "iam.amazonaws.com",
            "x-amz-date": "20150830T123600Z",
        },
        signed_headers=["content-type", "host", "x-amz-date"],
        payload_hash="e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        amz_date="20150830T123600Z",
        service="iam",
    )
    assert auth == (
        "AWS4-HMAC-SHA256 "
        "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_uri_encoding_rules():
    assert uri_encode("a b+c/d", encode_slash=False) == "a%20b%2Bc/d"
    assert uri_encode("a/b") == "a%2Fb"
    assert canonical_query([("b", "2"), ("a", "1 ")]) == "a=1%20&b=2"


# -- protocol e2e ----------------------------------------------------------


def test_object_roundtrip_and_check(client):
    client.check()
    client.put_object("data/x.json", b'{"v": 1}')
    assert client.get_object("data/x.json") == b'{"v": 1}'
    assert client.head_object("data/x.json")
    assert client.get_object("data/missing.json") is None
    assert not client.head_object("data/missing.json")
    client.delete_object("data/x.json")
    assert client.get_object("data/x.json") is None


def test_keys_with_special_characters(client):
    key = "meta/str eam+x/schema v1.json"
    client.put_object(key, b"1")
    assert client.get_object(key) == b"1"
    keys, _ = client.list_objects(prefix="meta/str eam+x/")
    assert keys == [key]
    client.delete_object(key)


def test_wrong_secret_and_tampered_body_rejected(mini, client):
    bad = S3Client(
        S3Config(
            endpoint_url=mini.endpoint_url,
            bucket="parseable",
            access_key="AKIDTEST",
            secret_key="wrong",
        )
    )
    with pytest.raises(S3Error) as ei:
        bad.put_object("x", b"1")
    assert ei.value.status == 403
    unknown = S3Client(
        S3Config(
            endpoint_url=mini.endpoint_url,
            bucket="parseable",
            access_key="NOBODY",
            secret_key="x",
        )
    )
    with pytest.raises(S3Error) as ei:
        unknown.get_object("x")
    assert ei.value.status == 403


def test_list_objects_delimiter_and_pagination(client):
    for i in range(7):
        client.put_object(f"pag/a/{i:02d}.json", b"1")
    client.put_object("pag/b/leaf.json", b"1")
    client.put_object("pag/top.json", b"1")
    # delimiter: immediate children only
    keys, prefixes = client.list_objects(prefix="pag/", delimiter="/")
    assert keys == ["pag/top.json"]
    assert prefixes == ["pag/a/", "pag/b/"]
    # pagination with a page size smaller than the result
    keys, _ = client.list_objects(prefix="pag/a/", max_keys=3)
    assert keys == [f"pag/a/{i:02d}.json" for i in range(7)]
    # delimiter + pagination: page break inside a group must not
    # duplicate its common prefix
    _, prefixes = client.list_objects(prefix="pag/", delimiter="/", max_keys=1)
    assert prefixes == ["pag/a/", "pag/b/"]
    client.delete_objects(
        [f"pag/a/{i:02d}.json" for i in range(7)]
        + ["pag/b/leaf.json", "pag/top.json"]
    )
    keys, _ = client.list_objects(prefix="pag/")
    assert keys == []


# -- metastore over S3 -----------------------------------------------------


def test_s3_metastore_primitives(client):
    ms = S3Metastore(client, "/store", key_prefix="meta")
    assert ms.get_json("/store/a/b.json") is None
    ms.put_json("/store/a/b.json", {"x": 1})
    ms.put_json("/store/a/c/d.json", [1, 2])
    assert ms.get_json("/store/a/b.json") == {"x": 1}
    assert ms.exists("/store/a/b.json")
    assert ms.exists("/store/a/c")  # "directory" existence via prefix
    assert not ms.exists("/store/a/zzz.json")
    assert ms.list_dirs("/store/a") == ["c"]
    ms.delete_prefix("/store/a")
    assert not ms.exists("/store/a/b.json")
    with pytest.raises(ValueError):
        ms.put_json("/elsewhere/x.json", {})


def test_full_lifecycle_through_s3_metastore(spark, tmp_path, mini, client):
    """test_metastore.py's lifecycle criterion, S3 edition: every
    metadata artifact round-trips through signed S3 requests while
    parquet data stays on the local data plane."""
    from parseable_spark.server import ParseableAPI

    root = str(tmp_path / "store")
    ms = S3Metastore(client, root, key_prefix="meta")
    prev = set_metastore(ms)
    try:
        api = ParseableAPI(spark, root, auth=("admin", "pw"))
        api.create_stream("app", time_partition=None)
        base = datetime(2026, 8, 10, 9, 0)
        store = api._stores["app"]
        store.ingest(
            [{"level": "info", "latency_ms": float(i)} for i in range(6)],
            p_timestamp=base,
        )
        store.flush()
        # parquet on the data plane; NO metadata json beside it
        local_json = [
            f
            for _, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".json")
        ]
        assert local_json == []
        keys, _ = client.list_objects(prefix="meta/")
        assert any(k.endswith("app/manifest.json") for k in keys)

        # restart: rediscovery served entirely from the bucket
        api2 = ParseableAPI(spark, root, auth=("admin", "pw"))
        assert "app" in api2._stores
        rows = api2.query(
            {
                "query": "SELECT count(*) AS n FROM app",
                "startTime": (base - timedelta(hours=1)).strftime(
                    "%Y-%m-%dT%H:%M:%SZ"
                ),
                "endTime": (base + timedelta(hours=1)).strftime(
                    "%Y-%m-%dT%H:%M:%SZ"
                ),
            }
        )
        assert rows == [{"n": 6}]
        api2.delete_stream("app")
        keys, _ = client.list_objects(prefix="meta/")
        assert not any("/app/" in k for k in keys)
    finally:
        set_metastore(prev)


def test_s3_config_from_env_reference_rules(mini):
    from parseable_spark.storage.objectstore import s3_config_from_env

    env = {
        "P_S3_URL": mini.endpoint_url,
        "P_S3_REGION": "us-east-1",
        "P_S3_BUCKET": "parseable",
        "P_S3_ACCESS_KEY": "AKIDTEST",
        "P_S3_SECRET_KEY": CREDS["AKIDTEST"],
    }
    cfg = s3_config_from_env(env)
    assert cfg.bucket == "parseable" and cfg.use_path_style
    with pytest.raises(ValueError, match="P_S3_URL"):
        s3_config_from_env({"P_S3_REGION": "r", "P_S3_BUCKET": "b"})
    with pytest.raises(ValueError, match="set together"):
        s3_config_from_env({**env, "P_S3_SECRET_KEY": ""})
    assert not s3_config_from_env({**env, "P_S3_PATH_STYLE": "false"}).use_path_style


def test_use_s3_storage_boot_wiring(mini):
    from parseable_spark.metastore import get_metastore, set_metastore
    from parseable_spark.storage.objectstore import use_s3_storage

    cfg = S3Config(
        endpoint_url=mini.endpoint_url,
        bucket="parseable",
        access_key="AKIDTEST",
        secret_key=CREDS["AKIDTEST"],
    )
    prev = set_metastore(get_metastore())  # snapshot current
    try:
        conf = use_s3_storage("/boot_root", cfg)
        assert conf["spark.hadoop.fs.s3a.endpoint"] == mini.endpoint_url
        ms = get_metastore()
        assert isinstance(ms, S3Metastore)
        ms.put_json("/boot_root/x.json", {"ok": 1})
        assert ms.get_json("/boot_root/x.json") == {"ok": 1}
        ms.delete_prefix("/boot_root")
    finally:
        set_metastore(prev)


# -- data plane plumbing ---------------------------------------------------


def test_s3a_conf_mapping_and_loud_jar_failure(spark):
    cfg = S3Config(
        endpoint_url="https://s3.eu-central-1.amazonaws.com",
        bucket="logs",
        region="eu-central-1",
        access_key="AKID",
        secret_key="sk",
        use_path_style=False,
    )
    conf = s3a_spark_conf(cfg)
    assert conf["spark.hadoop.fs.s3a.endpoint.region"] == "eu-central-1"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "false"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AKID"
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert data_root_uri(cfg) == "s3a://logs/data"
    # this container has no hadoop-aws jars: the check must fail LOUD
    with pytest.raises(RuntimeError, match="hadoop-aws"):
        require_s3a(spark)
