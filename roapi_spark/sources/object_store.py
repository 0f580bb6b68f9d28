"""Object-store registration: translate table ``io_option`` credentials
(key/secret/endpoint/region/...) and environment fallbacks into the Hadoop
filesystem configuration Spark's readers use, per URI scheme.

Reference behavior: the reference builds an object_store client from the
table URI + env/config (columnq/src/columnq.rs:209-273,
columnq/src/io/object_store.rs:50-60).  Spark's equivalent is the
``fs.s3a.*`` / ``fs.gs.*`` / ``fs.azure.*`` Hadoop confs; the actual jars
(hadoop-aws, gcs-connector, hadoop-azure) ship on real clusters — in this
container only the conf mapping is exercisable, so it gets unit tests and
the reads stay pass-through.

Also rewrites ``s3://`` to ``s3a://`` (Hadoop's maintained S3 client) and
``az://container@account/...`` to the abfss form, so reference configs work
unchanged.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import SparkSession

from roapi_spark.config import TableSource

OBJECT_STORE_SCHEMES = ("s3", "s3a", "gs", "gcs", "az", "abfs", "abfss", "wasb", "wasbs")


def rewrite_uri(uri: str) -> str:
    """Map reference URI schemes onto the Hadoop connector schemes."""
    if uri.startswith("s3://"):
        return "s3a://" + uri[len("s3://") :]
    if uri.startswith("gcs://"):
        return "gs://" + uri[len("gcs://") :]
    if uri.startswith("az://"):
        # az://container@account/path -> abfss://container@account.dfs.core.windows.net/path
        rest = uri[len("az://") :]
        if "@" in rest.split("/", 1)[0]:
            container_account, _, path = rest.partition("/")
            container, _, account = container_account.partition("@")
            return f"abfss://{container}@{account}.dfs.core.windows.net/{path}"
        return "abfss://" + rest
    return uri


def _env(*names: str) -> str | None:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def hadoop_confs_for(ts: TableSource) -> dict[str, str]:
    """Hadoop conf key/values for a table's object-store credentials.

    io_option keys mirror the reference's S3/GCS/Azure options
    (columnq.rs:209-273): access_key_id / secret_access_key / session_token
    / endpoint / region / allow_http (S3); service_account_path /
    service_account_key / project_id (GCS); account / access_key / sas_token
    (Azure).  Environment variables fill any gaps, same precedence as the
    reference (explicit option wins).
    """
    scheme = urlparse(rewrite_uri(ts.uri)).scheme
    io = {str(k): str(v) for k, v in (ts.io_option or {}).items()}
    confs: dict[str, str] = {}

    if scheme == "s3a":
        key = io.get("access_key_id") or _env("AWS_ACCESS_KEY_ID")
        secret = io.get("secret_access_key") or _env("AWS_SECRET_ACCESS_KEY")
        token = io.get("session_token") or _env("AWS_SESSION_TOKEN")
        endpoint = io.get("endpoint") or _env("AWS_ENDPOINT_URL", "AWS_ENDPOINT")
        region = io.get("region") or _env("AWS_REGION", "AWS_DEFAULT_REGION")
        if key:
            confs["fs.s3a.access.key"] = key
        if secret:
            confs["fs.s3a.secret.key"] = secret
        if token:
            confs["fs.s3a.session.token"] = token
            confs["fs.s3a.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
            )
        if endpoint:
            confs["fs.s3a.endpoint"] = endpoint
            # custom endpoints (minio & friends) need path-style addressing
            confs["fs.s3a.path.style.access"] = io.get("path_style", "true")
        if region:
            confs["fs.s3a.endpoint.region"] = region
        if io.get("allow_http", "").lower() in ("1", "true", "yes"):
            confs["fs.s3a.connection.ssl.enabled"] = "false"
    elif scheme == "gs":
        sa_path = io.get("service_account_path") or _env("GOOGLE_APPLICATION_CREDENTIALS")
        project = io.get("project_id") or _env("GOOGLE_CLOUD_PROJECT")
        if sa_path:
            confs["fs.gs.auth.type"] = "SERVICE_ACCOUNT_JSON_KEYFILE"
            confs["fs.gs.auth.service.account.json.keyfile"] = sa_path
        if project:
            confs["fs.gs.project.id"] = project
    elif scheme in ("abfs", "abfss", "wasb", "wasbs"):
        account = io.get("account") or _env("AZURE_STORAGE_ACCOUNT")
        access_key = io.get("access_key") or _env("AZURE_STORAGE_ACCESS_KEY", "AZURE_STORAGE_KEY")
        sas = io.get("sas_token") or _env("AZURE_STORAGE_SAS_TOKEN")
        host = urlparse(rewrite_uri(ts.uri)).netloc.split("@")[-1]
        if account and not host:
            host = f"{account}.dfs.core.windows.net"
        if access_key and host:
            confs[f"fs.azure.account.key.{host}"] = access_key
        if sas and host:
            confs[f"fs.azure.sas.fixed.token.{host}"] = sas
            confs[f"fs.azure.account.auth.type.{host}"] = "SAS"
    return confs


def apply_object_store_conf(spark: SparkSession, ts: TableSource) -> TableSource:
    """Set the Hadoop confs for ``ts`` and return it with the URI rewritten
    to the Hadoop connector scheme.  Safe to call repeatedly (idempotent
    per key); runtime hadoopConfiguration updates apply to subsequent
    reads, matching the reference's per-table object-store registration."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in hadoop_confs_for(ts).items():
        hconf.set(k, v)
    new_uri = rewrite_uri(ts.uri)
    if new_uri == ts.uri:
        return ts
    from dataclasses import replace

    return replace(ts, uri=new_uri)
