"""Azure Blob object storage (reference src/storage/azure_blob.rs).

Same three-layer proof as the S3 suite:
- Shared Key string-to-sign against the published docs example;
- client <-> MiniAzureServer protocol e2e where the SERVER verifies
  every signature by recomputation (wrong key / tampered body => fail);
- AzureMetastore hosting ALL engine metadata through the metastore
  seam, full server lifecycle.
"""

from __future__ import annotations

import base64
import os
from datetime import datetime, timedelta

import pytest

from parseable_spark.metastore import set_metastore
from parseable_spark.storage.azureblob import (
    AzureBlobClient,
    AzureBlobConfig,
    AzureError,
    AzureMetastore,
    MiniAzureServer,
    abfs_spark_conf,
    azure_config_from_env,
    data_root_uri,
    require_abfs,
    sign_shared_key,
    string_to_sign,
    use_azure_storage,
)

ACCOUNT = "myaccount"
KEY_B64 = base64.b64encode(b"0123456789abcdef0123456789abcdef").decode()


@pytest.fixture(scope="module")
def mini():
    srv = MiniAzureServer({ACCOUNT: KEY_B64}).start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def client(mini):
    return AzureBlobClient(
        AzureBlobConfig(
            endpoint_url=mini.endpoint_url,
            account=ACCOUNT,
            container="parseable",
            access_key=KEY_B64,
        )
    )


# -- signing ---------------------------------------------------------------


def test_string_to_sign_matches_docs_example():
    """The worked canonicalization example from the Azure Shared Key
    docs (Get Container Metadata, 2015-02-21): twelve standard slots,
    sorted x-ms headers, resource with decoded sorted query params."""
    sts = string_to_sign(
        method="GET",
        account="myaccount",
        path="/mycontainer",
        query=[("restype", "container"), ("comp", "metadata")],
        headers={
            "x-ms-date": "Fri, 26 Jun 2015 23:39:12 GMT",
            "x-ms-version": "2015-02-21",
        },
    )
    assert sts == (
        "GET\n\n\n\n\n\n\n\n\n\n\n\n"
        "x-ms-date:Fri, 26 Jun 2015 23:39:12 GMT\n"
        "x-ms-version:2015-02-21\n"
        "/myaccount/mycontainer\ncomp:metadata\nrestype:container"
    )


def test_content_length_zero_is_empty_slot():
    sts = string_to_sign(
        method="DELETE",
        account="a",
        path="/c/k",
        query=[],
        headers={"content-length": "0", "x-ms-date": "D"},
    )
    # slot 3 (Content-Length) must be empty, not "0" (2015-02-21 rule)
    assert sts.split("\n")[3] == ""


def test_signature_is_hmac_of_decoded_key():
    import hashlib
    import hmac as hm

    sts = "GET\n\n\n\n\n\n\n\n\n\n\n\nx-ms-date:D\n/a/c"
    sig = sign_shared_key("a", KEY_B64, sts)
    mac = hm.new(
        base64.b64decode(KEY_B64), sts.encode(), hashlib.sha256
    ).digest()
    assert sig == f"SharedKey a:{base64.b64encode(mac).decode()}"


# -- protocol e2e ----------------------------------------------------------


def test_blob_roundtrip_and_check(client):
    client.check()
    client.put_blob("dir/a.json", b'{"v": 1}')
    assert client.get_blob("dir/a.json") == b'{"v": 1}'
    assert client.head_blob("dir/a.json")
    assert client.get_blob("missing") is None
    assert not client.head_blob("missing")
    client.delete_blob("dir/a.json")
    assert client.get_blob("dir/a.json") is None


def test_wrong_key_and_tampered_body_rejected(mini, client):
    bad = AzureBlobClient(
        AzureBlobConfig(
            endpoint_url=mini.endpoint_url,
            account=ACCOUNT,
            container="parseable",
            access_key=base64.b64encode(b"wrongwrongwrongwrongwrongwrong!!").decode(),
        )
    )
    with pytest.raises(AzureError) as ei:
        bad.put_blob("x", b"data")
    assert ei.value.status == 403
    # unknown account
    unk = AzureBlobClient(
        AzureBlobConfig(
            endpoint_url=mini.endpoint_url,
            account="nobody",
            container="parseable",
            access_key=KEY_B64,
        )
    )
    with pytest.raises(AzureError) as ei:
        unk.get_blob("x")
    assert ei.value.status == 403
    # tampered payload: replay a signed PUT with a different body —
    # Content-MD5 sits in a signed slot, so the server's hash check
    # rejects it
    import urllib.error
    import urllib.request

    url = f"{mini.endpoint_url}/parseable/t"
    md5 = base64.b64encode(__import__("hashlib").md5(b"good").digest()).decode()
    from datetime import timezone

    hdrs = {
        "x-ms-date": datetime.now(timezone.utc).strftime(
            "%a, %d %b %Y %H:%M:%S GMT"
        ),
        "x-ms-version": "2021-08-06",
        "x-ms-blob-type": "BlockBlob",
        "content-md5": md5,
        "content-length": "4",
        "content-type": "application/octet-stream",
    }
    sts = string_to_sign(
        method="PUT", account=ACCOUNT, path="/parseable/t", query=[], headers=hdrs
    )
    hdrs["Authorization"] = sign_shared_key(ACCOUNT, KEY_B64, sts)
    req = urllib.request.Request(url, data=b"evil", method="PUT", headers=hdrs)
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400  # Md5Mismatch


def test_list_blobs_delimiter_and_pagination(client):
    for i in range(7):
        client.put_blob(f"p/s{i % 2}/f{i}.json", b"{}")
    names, prefixes = client.list_blobs(prefix="p/", delimiter="/")
    assert names == [] and sorted(prefixes) == ["p/s0/", "p/s1/"]
    # page size 2 forces NextMarker paging; results must be complete
    # and duplicate-free
    names, _ = client.list_blobs(prefix="p/", max_results=2)
    assert len(names) == 7 and len(set(names)) == 7
    # delimiter + tiny page: common prefixes must not re-emit
    names, prefixes = client.list_blobs(prefix="p/", delimiter="/", max_results=1)
    assert sorted(prefixes) == ["p/s0/", "p/s1/"] and names == []
    client.delete_blobs([f"p/s{i % 2}/f{i}.json" for i in range(7)])


def test_azure_metastore_primitives(client):
    ms = AzureMetastore(client, "/store", key_prefix="meta")
    assert ms.get_json("/store/a.json") is None
    ms.put_json("/store/s1/manifest.json", {"files": [1]})
    ms.put_json("/store/s2/manifest.json", {"files": [2]})
    assert ms.get_json("/store/s1/manifest.json") == {"files": [1]}
    assert ms.exists("/store/s1/manifest.json")
    assert ms.exists("/store/s1")  # prefix existence
    assert ms.list_dirs("/store") == ["s1", "s2"]
    ms.delete_prefix("/store/s1")
    assert not ms.exists("/store/s1")
    assert ms.list_dirs("/store") == ["s2"]
    ms.delete_prefix("/store")
    with pytest.raises(ValueError, match="outside"):
        ms.get_json("/elsewhere/x.json")


def test_full_lifecycle_through_azure_metastore(spark, tmp_path, mini, client):
    """test_metastore.py's lifecycle criterion, Azure edition: every
    metadata artifact round-trips through Shared-Key-signed requests
    while parquet stays on the local data plane."""
    from parseable_spark.server import ParseableAPI

    root = str(tmp_path / "store")
    ms = AzureMetastore(client, root, key_prefix="meta")
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
        local_json = [
            f for _, _, fs in os.walk(root) for f in fs if f.endswith(".json")
        ]
        assert local_json == []
        names, _ = client.list_blobs(prefix="meta/")
        assert any(n.endswith("app/manifest.json") for n in names)

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
        names, _ = client.list_blobs(prefix="meta/")
        assert not any("/app/" in n for n in names)
    finally:
        set_metastore(prev)


# -- config + data plane ---------------------------------------------------


def test_azure_config_from_env_reference_rules(mini):
    env = {
        "P_AZR_URL": mini.endpoint_url,
        "P_AZR_ACCOUNT": ACCOUNT,
        "P_AZR_CONTAINER": "parseable",
        "P_AZR_ACCESS_KEY": KEY_B64,
    }
    cfg = azure_config_from_env(env)
    assert cfg.account == ACCOUNT and cfg.container == "parseable"
    with pytest.raises(ValueError, match="P_AZR_URL"):
        azure_config_from_env({"P_AZR_ACCOUNT": "a", "P_AZR_CONTAINER": "c"})
    with pytest.raises(ValueError, match="P_AZR_ACCESS_KEY"):
        azure_config_from_env({k: v for k, v in env.items() if "ACCESS" not in k})
    with pytest.raises(ValueError, match="not\\s+implemented"):
        azure_config_from_env(
            {
                **{k: v for k, v in env.items() if "ACCESS" not in k},
                "P_AZR_CLIENT_ID": "cid",
                "P_AZR_CLIENT_SECRET": "cs",
                "P_AZR_TENANT_ID": "t",
            }
        )


def test_use_azure_storage_boot_wiring(mini):
    from parseable_spark.metastore import get_metastore

    cfg = AzureBlobConfig(
        endpoint_url=mini.endpoint_url,
        account=ACCOUNT,
        container="parseable",
        access_key=KEY_B64,
    )
    prev = set_metastore(get_metastore())
    try:
        conf = use_azure_storage("/boot_root", cfg)
        host = f"{ACCOUNT}.dfs.core.windows.net"
        assert conf[f"spark.hadoop.fs.azure.account.key.{host}"] == KEY_B64
        ms = get_metastore()
        assert isinstance(ms, AzureMetastore)
        ms.put_json("/boot_root/x.json", {"ok": 1})
        assert ms.get_json("/boot_root/x.json") == {"ok": 1}
        ms.delete_prefix("/boot_root")
    finally:
        set_metastore(prev)


def test_abfs_conf_mapping_and_loud_jar_failure(spark):
    cfg = AzureBlobConfig(
        endpoint_url="https://acct.blob.core.windows.net",
        account="acct",
        container="logs",
        access_key=KEY_B64,
    )
    conf = abfs_spark_conf(cfg)
    assert conf["spark.hadoop.fs.azure.account.auth.type"] == "SharedKey"
    assert data_root_uri(cfg) == "abfss://logs@acct.dfs.core.windows.net/data"
    # this container has no hadoop-azure jar: the check must fail LOUD
    with pytest.raises(RuntimeError, match="hadoop-azure"):
        require_abfs(spark)


def test_client_requires_shared_key():
    with pytest.raises(ValueError, match="Shared Key"):
        AzureBlobClient(
            AzureBlobConfig(
                endpoint_url="http://x", account="a", container="c", access_key=""
            )
        )


# -- boot dispatch (cli.rs storage subcommands) ----------------------------


def test_boot_storage_mode_dispatch(mini, monkeypatch):
    from parseable_spark.metastore import (
        FilesystemMetastore,
        get_metastore,
        set_metastore,
    )
    from parseable_spark.storage.boot import boot_storage, gcs_config_from_env
    from parseable_spark.storage.objectstore import S3Metastore

    prev = set_metastore(get_metastore())
    try:
        assert boot_storage("local-store", "/r") == {}
        assert isinstance(get_metastore(), FilesystemMetastore)

        monkeypatch.setenv("P_AZR_URL", mini.endpoint_url)
        monkeypatch.setenv("P_AZR_ACCOUNT", ACCOUNT)
        monkeypatch.setenv("P_AZR_CONTAINER", "parseable")
        monkeypatch.setenv("P_AZR_ACCESS_KEY", KEY_B64)
        conf = boot_storage("blob-store", "/r")
        assert isinstance(get_metastore(), AzureMetastore)
        assert any(k.startswith("spark.hadoop.fs.azure.") for k in conf)

        monkeypatch.setenv("P_GCS_BUCKET", "b")
        monkeypatch.setenv("P_GCS_HMAC_KEY", "GOOG1EXAMPLE")
        monkeypatch.setenv("P_GCS_HMAC_SECRET", "sek")
        conf = boot_storage("gcs-store", "/r")
        assert isinstance(get_metastore(), S3Metastore)
        assert conf["spark.hadoop.fs.s3a.endpoint"] == "https://storage.googleapis.com"

        cfg = gcs_config_from_env(
            {"P_GCS_BUCKET": "b", "P_GCS_HMAC_KEY": "k", "P_GCS_HMAC_SECRET": "s"}
        )
        assert cfg.endpoint_url == "https://storage.googleapis.com"
        with pytest.raises(ValueError, match="P_GCS_BUCKET"):
            gcs_config_from_env({})
        # credential-less boot must fail loud, not 403 at first use
        with pytest.raises(ValueError, match="HMAC"):
            gcs_config_from_env({"P_GCS_BUCKET": "b", "P_GCS_HMAC_KEY": "k"})
        with pytest.raises(ValueError, match="HMAC"):
            gcs_config_from_env({"P_GCS_BUCKET": "b"})

        with pytest.raises(ValueError, match="unknown storage mode"):
            boot_storage("floppy-store", "/r")
    finally:
        set_metastore(prev)
