"""Remote-filesystem configuration: protocol/profile kwargs → Spark confs.

The reference builds fsspec/pyarrow filesystems from ``protocol`` /
``profile`` / ``endpoint_url`` / ``storage_options`` kwargs
(``src/pydala/filesystem/fs.py:7-139``) and resolves AWS credential profiles
from ``~/.aws/credentials`` (``filesystem/_aws.py:6-98``). On Spark the
executor-side IO goes through the Hadoop FileSystem connectors instead, so
the same kwargs map to ``fs.s3a.*`` / ``fs.gs.*`` / ``fs.azure.*`` Hadoop
configuration — *config, not code* (SURVEY §2.13): no driver-side filesystem
object exists because every executor opens the object store directly.

Scale note: this is exactly why the reference's remote→local cache sync
(S11) is obviated — 1000 executors each read their own byte ranges from the
object store; nothing funnels through the driver.
"""

from __future__ import annotations

import configparser
import os

from pyspark.sql import SparkSession

# reference protocol spellings (fs.py:13-60) → canonical URI scheme
_SCHEME = {
    "s3": "s3a",
    "s3a": "s3a",
    "s3n": "s3a",
    "gs": "gs",
    "gcs": "gs",
    "az": "abfss",
    "abfs": "abfss",
    "abfss": "abfss",
    "hdfs": "hdfs",
    "file": "file",
    "local": "file",
}


def canonical_scheme(protocol: str) -> str:
    """Map a reference protocol name to the Hadoop connector URI scheme."""
    p = protocol.lower()
    if p not in _SCHEME:
        raise ValueError(
            f"unsupported protocol {protocol!r}; known: {sorted(_SCHEME)}"
        )
    return _SCHEME[p]


def load_aws_profile(
    profile: str = "default",
    credentials_file: str = "~/.aws/credentials",
) -> dict[str, str]:
    """Read one profile from the standard AWS shared-credentials file
    (≙ ``AwsCredentialsManager._load_credentials``, ``_aws.py:27-41``)."""
    path = os.path.expanduser(credentials_file)
    config = configparser.ConfigParser()
    config.read(path)
    if profile not in config.sections():
        raise ValueError(f"profile {profile!r} not found in {path}")
    return dict(config[profile])


def configure_filesystem(
    spark: SparkSession,
    protocol: str = "s3",
    key: str | None = None,
    secret: str | None = None,
    token: str | None = None,
    endpoint_url: str | None = None,
    region: str | None = None,
    profile: str | None = None,
    anon: bool = False,
    account_name: str | None = None,
    account_key: str | None = None,
    keyfile: str | None = None,
    project: str | None = None,
    host: str | None = None,
    port: int | None = None,
    credentials_file: str = "~/.aws/credentials",
) -> dict[str, str]:
    """Apply object-store credentials/endpoint to a live session and return
    the conf dict that was set (≙ ``fsspec_filesystem``/``pyarrow_filesystem``
    dispatch, reference ``fs.py:7-139``).

    Confs land on the SparkContext's hadoopConfiguration so subsequent
    ``spark.read``/``write`` against ``s3a://`` / ``gs://`` / ``abfss://`` /
    ``hdfs://`` URIs pick them up without a session restart. The actual
    connector jars (hadoop-aws, gcs-connector, hadoop-azure) ship with the
    cluster distribution; this helper only supplies their configuration.
    """
    scheme = canonical_scheme(protocol)
    confs: dict[str, str] = {}

    if scheme == "s3a":
        if profile is not None and key is None and secret is None:
            creds = load_aws_profile(profile, credentials_file)
            key = creds.get("aws_access_key_id")
            secret = creds.get("aws_secret_access_key")
            token = token or creds.get("aws_session_token")
            region = region or creds.get("region")
        if anon:
            confs["fs.s3a.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
            )
        if key:
            confs["fs.s3a.access.key"] = key
        if secret:
            confs["fs.s3a.secret.key"] = secret
        if token:
            confs["fs.s3a.session.token"] = token
            confs["fs.s3a.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
            )
        if endpoint_url:
            confs["fs.s3a.endpoint"] = endpoint_url
            # custom endpoints (minio & friends) require path-style addressing
            confs["fs.s3a.path.style.access"] = "true"
        if region:
            confs["fs.s3a.endpoint.region"] = region
    elif scheme == "gs":
        if keyfile:
            confs["fs.gs.auth.type"] = "SERVICE_ACCOUNT_JSON_KEYFILE"
            confs["fs.gs.auth.service.account.json.keyfile"] = keyfile
        if project:
            confs["fs.gs.project.id"] = project
    elif scheme == "abfss":
        if account_name and account_key:
            confs[
                f"fs.azure.account.key.{account_name}.dfs.core.windows.net"
            ] = account_key
    elif scheme == "hdfs":
        if host:
            confs["fs.defaultFS"] = f"hdfs://{host}:{port or 8020}"

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in confs.items():
        hconf.set(k, v)
    return confs


def remote_uri(path: str, bucket: str | None, protocol: str | None) -> str:
    """Compose the full connector URI the way the reference composes
    ``protocol://bucket/path`` (``reader.py:22-63`` path+bucket handling).

    Already-qualified paths pass through (with ``s3://`` normalized to the
    Hadoop connector's ``s3a://``); bare paths get ``scheme://[bucket/]``.
    """
    for proto, scheme in _SCHEME.items():
        prefix = f"{proto}://"
        if path.lower().startswith(prefix):
            return f"{scheme}://{path[len(prefix):]}"
    if protocol is None or canonical_scheme(protocol) == "file":
        return f"{bucket.rstrip('/')}/{path}" if bucket else path
    scheme = canonical_scheme(protocol)
    if bucket:
        return f"{scheme}://{bucket.strip('/')}/{path.lstrip('/')}"
    return f"{scheme}://{path.lstrip('/')}"
