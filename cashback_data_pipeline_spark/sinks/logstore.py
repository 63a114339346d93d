"""Storage primitives for the manifest commit protocol (the LogStore
seam the :mod:`manifest` docstring has always specified).

The manifest layer needs exactly five storage capabilities: list a
directory, read a small file, publish a small file ATOMICALLY-IF-ABSENT
(the commit CAS), enumerate a data directory's files, and delete.
Everything above this seam — optimistic-concurrency commits, pinned
readers, vacuum — is storage-agnostic. This module provides two
implementations, mirroring the public Delta Lake LogStore designs
(HDFSLogStore's FileContext rename and S3SingleDriverLogStore's
in-process serialization):

- :class:`LocalLogStore` — plain paths. The CAS is ``os.link`` (O_EXCL
  semantics: link(2) fails if the target exists, and the fully-written,
  fsynced content appears in one atomic metadata op). This is the
  strongest primitive a POSIX filesystem offers and the default for any
  path without a URI scheme.
- :class:`HadoopFsLogStore` — any ``scheme://`` URI Spark's Hadoop
  configuration can resolve (``hdfs://``, ``file://``, a mounted
  ``viewfs://``, an ``s3a://`` with a consistent rename, ...). The CAS
  is ``FileContext.rename(src, dst, Options.Rename.NONE)`` — on HDFS an
  atomic NameNode op that fails with FileAlreadyExistsException when the
  destination exists, which is precisely Delta's HDFSLogStore contract.
  Same-process committers are additionally serialized by an in-process
  lock (the S3SingleDriverLogStore idea), so on stores whose rename is
  check-then-act rather than atomic (the raw ``file://`` scheme, used by
  the contract tests) concurrent commits from one driver are still
  exactly-once; CROSS-process safety on such stores is best-effort and
  the local-path deployment should use :class:`LocalLogStore` instead.
- :class:`ObjectStoreLogStore` — object stores, where rename is
  copy+delete and NOT a CAS (two drivers on two machines can both
  "win" a version under HadoopFsLogStore). Data files still flow
  through the Hadoop connector (``s3a://``/``gs://`` — inherited
  primitives), but the manifest publish is ONE conditional full-object
  PUT through a :class:`ConditionalPutClient`: S3 ``PutObject`` with
  ``If-None-Match: *`` (a public S3 API since 2024; also honored by
  MinIO/R2-class S3-compatible stores), GCS ``ifGenerationMatch=0``.
  The service arbitrates the race — atomic across machines, no lock,
  no temp file, no external coordination table. This is the
  multi-driver-safe commit on the storage a real 100 TB cluster has;
  a conditional PUT is strictly stronger than Delta's original
  S3-DynamoDB LogStore design (same guarantee, no second system).

Resolution (:func:`get_log_store`): an explicit per-table-prefix
override wins (``register_log_store``, longest prefix first — how a
deployment pins a custom client), then ``s3://``/``s3a://``/``s3n://``/
``gs://`` map to :class:`ObjectStoreLogStore`, any other scheme to
:class:`HadoopFsLogStore`, plain paths to :class:`LocalLogStore`.

The reference's warehouse lives on object storage and its transactional
serving load assumes the store provides the atomicity
(glue_script.py:77, load_to_redshift_lambda.py:119-127); this seam is
what lets every manifest-backed capability (incremental inverted index,
incremental IVF, streaming near-dup index, transactional loads) commit
on the storage a real cluster has.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import shutil
import threading
import uuid

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):/")

TMP_PREFIX = ".tmp_"

# object-store schemes whose rename is copy+delete: the commit CAS must
# be a service-side conditional PUT, never a rename
_CONDITIONAL_PUT_SCHEMES = {"s3", "s3a", "s3n", "gs", "gcs"}

# per-table-prefix store factories, longest prefix wins — how a
# deployment pins a specific store/client to a table tree (and how the
# contract tests route a file:// root through ObjectStoreLogStore)
_PREFIX_FACTORIES: list[tuple[str, object]] = []


def register_log_store(prefix: str, factory) -> None:
    """Pin ``factory(spark) -> store`` for every table under ``prefix``.
    Longest registered prefix wins; re-registering a prefix replaces it."""
    unregister_log_store(prefix)
    _PREFIX_FACTORIES.append((prefix, factory))
    _PREFIX_FACTORIES.sort(key=lambda t: len(t[0]), reverse=True)


def unregister_log_store(prefix: str) -> None:
    _PREFIX_FACTORIES[:] = [(p, f) for p, f in _PREFIX_FACTORIES if p != prefix]


def get_log_store(table: str, spark=None):
    """Resolve the store for a table root (module docstring): explicit
    prefix registration → object-store schemes (conditional-put CAS) →
    any other scheme (Hadoop FS CAS) → plain path (POSIX primitives)."""
    for prefix, factory in _PREFIX_FACTORIES:
        # boundary-aware: "s3://b/tables" must not capture "s3://b/tables2"
        p = prefix.rstrip("/")
        if table == p or table.startswith(p + "/"):
            return factory(spark)
    m = _SCHEME_RE.match(table)
    if m:
        if m.group(1).lower() in _CONDITIONAL_PUT_SCHEMES:
            return ObjectStoreLogStore(spark)
        return HadoopFsLogStore(spark)
    return LocalLogStore()


class LocalLogStore:
    """POSIX-primitive store: O_EXCL-link CAS, listdir discovery."""

    def join(self, base: str, *parts: str) -> str:
        return os.path.join(base, *parts)

    def relativize(self, base: str, child: str) -> str:
        return os.path.relpath(child, base)

    def list_names(self, directory: str) -> list[str]:
        # os.listdir rather than glob DELIBERATELY: glob swallows
        # OSError/PermissionError (an NFS hiccup would read as "table
        # does not exist") — only a true FileNotFoundError may mean
        # not-yet-created (see manifest.current_version).
        return os.listdir(directory)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def publish_atomic(self, directory: str, name: str, content: str) -> bool:
        return self.publish_atomic_bytes(directory, name, content.encode("utf-8"))

    def publish_atomic_bytes(self, directory: str, name: str, content: bytes) -> bool:
        """The commit CAS: write the FULL content to a hidden temp file,
        fsync, then ``os.link`` it to the target name — link(2) both
        fails if the target exists and makes the complete content appear
        in one atomic metadata op. A crash mid-publish leaves only a
        temp file (swept by vacuum), never a torn target."""
        os.makedirs(directory, exist_ok=True)
        tmp = os.path.join(directory, f"{TMP_PREFIX}{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, os.path.join(directory, name))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def write_overwrite(self, directory: str, name: str, content: bytes) -> None:
        """Atomic last-writer-wins overwrite (NOT a CAS) — for
        advisory/hint files like the manifest log's ``_last_checkpoint``
        pointer, where any committed value is valid and readers tolerate
        staleness. temp + ``os.replace`` so a reader never sees a torn
        file."""
        os.makedirs(directory, exist_ok=True)
        tmp = os.path.join(directory, f"{TMP_PREFIX}{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(directory, name))

    def list_files_recursive(self, directory: str, suffix: str = "") -> list[str]:
        return [
            p
            for p in _glob.glob(os.path.join(directory, "**", "*" + suffix), recursive=True)
            if os.path.isfile(p)
        ]

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def delete_recursive(self, path: str) -> None:
        shutil.rmtree(path)

    def delete_file(self, path: str) -> None:
        os.unlink(path)


class HadoopFsLogStore:
    """Hadoop-FileSystem-API store, driven through the active Spark
    session's JVM gateway. All metadata ops go through the SAME Hadoop
    configuration Spark uses for data files, so a table root resolves
    identically for ``df.write.parquet`` and for the manifest machinery.

    CAS atomicity contract: guaranteed cross-process on filesystems
    whose no-overwrite rename is atomic (HDFS; Delta's HDFSLogStore
    makes the same claim); same-process committers are always serialized
    by ``_publish_lock`` regardless of filesystem (class docstring of
    this module)."""

    _publish_lock = threading.Lock()

    def __init__(self, spark=None):
        if spark is None:
            from pyspark.sql import SparkSession

            # getActiveSession is THREAD-local; racing committer threads
            # (and foreachBatch workers) fall back to the process-wide
            # instantiated session
            spark = SparkSession.getActiveSession() or SparkSession._instantiatedSession
        if spark is None:
            raise RuntimeError(
                "HadoopFsLogStore needs an active SparkSession (its JVM hosts "
                "the Hadoop FileSystem client for scheme:// table paths)"
            )
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    # -- JVM helpers ----------------------------------------------------
    def _jpath(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._jpath(p).getFileSystem(self._conf)

    @staticmethod
    def _java_class(exc) -> str:
        je = getattr(exc, "java_exception", None)
        try:
            return je.getClass().getName() if je is not None else ""
        except Exception:
            return ""

    def _translate_fnf(self, exc, path: str):
        if "FileNotFoundException" in self._java_class(exc):
            raise FileNotFoundError(path) from exc
        raise exc

    # -- path algebra ---------------------------------------------------
    def join(self, base: str, *parts: str) -> str:
        # os.path.join semantics: an absolute part (scheme:// or /-rooted)
        # RESTARTS the path — how a shallow clone's foreign file entries
        # resolve through the same join every reader already uses
        out = base.rstrip("/")
        for p in parts:
            if _SCHEME_RE.match(p) or p.startswith("/"):
                out = p.rstrip("/")
            else:
                out = out + "/" + p.strip("/")
        return out

    def relativize(self, base: str, child: str) -> str:
        # normalize through Hadoop Path URIs so "file:///x" and
        # "file:/x/..." (the listing's rendering) compare equal
        b = self._jpath(base).toUri().getPath().rstrip("/")
        c = self._jpath(child).toUri().getPath()
        if not c.startswith(b + "/"):
            raise ValueError(f"{child!r} is not under {base!r}")
        return c[len(b) + 1 :]

    # -- primitives -----------------------------------------------------
    def list_names(self, directory: str) -> list[str]:
        from py4j.protocol import Py4JJavaError

        try:
            statuses = self._fs(directory).listStatus(self._jpath(directory))
        except Py4JJavaError as e:
            self._translate_fnf(e, directory)
        return [s.getPath().getName() for s in statuses]

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def read_bytes(self, path: str) -> bytes:
        from py4j.protocol import Py4JJavaError

        fs = self._fs(path)
        try:
            stream = fs.open(self._jpath(path))
        except Py4JJavaError as e:
            self._translate_fnf(e, path)
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return bytes(data)

    def _write_bytes(self, path: str, content: bytes) -> None:
        out = self._fs(path).create(self._jpath(path), False)
        try:
            out.write(bytearray(content))
            out.hflush()
        finally:
            out.close()

    def publish_atomic(self, directory: str, name: str, content: str) -> bool:
        return self.publish_atomic_bytes(directory, name, content.encode("utf-8"))

    def publish_atomic_bytes(self, directory: str, name: str, content: bytes) -> bool:
        """The commit CAS: write the FULL content to a hidden temp file,
        then ``FileContext.rename(..., Options.Rename.NONE)`` it to the
        target — on HDFS one atomic NameNode op that fails when the
        destination exists; a reader can never observe a half-written
        manifest. The in-process lock serializes same-driver committers
        on filesystems whose NONE-rename is check-then-act."""
        from py4j.protocol import Py4JJavaError

        fs = self._fs(directory)
        jdir = self._jpath(directory)
        fs.mkdirs(jdir)
        tmp = self.join(directory, f"{TMP_PREFIX}{uuid.uuid4().hex}")
        self._write_bytes(tmp, content)
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(jdir.toUri(), self._conf)
        rename_enum = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gateway.new_array(rename_enum, 1)
        opts[0] = rename_enum.NONE
        target = self.join(directory, name)
        with HadoopFsLogStore._publish_lock:
            try:
                fc.rename(self._jpath(tmp), self._jpath(target), opts)
                return True
            except Py4JJavaError as e:
                if "AlreadyExistsException" in self._java_class(e):
                    fs.delete(self._jpath(tmp), False)
                    return False
                raise

    def write_overwrite(self, directory: str, name: str, content: bytes) -> None:
        """Atomic last-writer-wins overwrite for hint files (see
        LocalLogStore.write_overwrite): temp + ``FileContext.rename(...,
        Options.Rename.OVERWRITE)`` — one atomic replace on HDFS-class
        stores, never a torn read."""
        fs = self._fs(directory)
        jdir = self._jpath(directory)
        fs.mkdirs(jdir)
        tmp = self.join(directory, f"{TMP_PREFIX}{uuid.uuid4().hex}")
        self._write_bytes(tmp, content)
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(jdir.toUri(), self._conf)
        rename_enum = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gateway.new_array(rename_enum, 1)
        opts[0] = rename_enum.OVERWRITE
        fc.rename(self._jpath(tmp), self._jpath(self.join(directory, name)), opts)

    def list_files_recursive(self, directory: str, suffix: str = "") -> list[str]:
        from py4j.protocol import Py4JJavaError

        try:
            it = self._fs(directory).listFiles(self._jpath(directory), True)
        except Py4JJavaError as e:
            if "FileNotFoundException" in self._java_class(e):
                return []
            raise
        out = []
        while it.hasNext():
            p = it.next().getPath().toString()
            if p.endswith(suffix):
                out.append(p)
        return out

    def exists(self, path: str) -> bool:
        return self._fs(path).exists(self._jpath(path))

    def mtime(self, path: str) -> float:
        from py4j.protocol import Py4JJavaError

        try:
            return self._fs(path).getFileStatus(self._jpath(path)).getModificationTime() / 1000.0
        except Py4JJavaError as e:
            self._translate_fnf(e, path)

    def delete_recursive(self, path: str) -> None:
        self._fs(path).delete(self._jpath(path), True)

    def delete_file(self, path: str) -> None:
        self._fs(path).delete(self._jpath(path), False)


class ObjectStoreLogStore(HadoopFsLogStore):
    """Object-store store: Hadoop FS primitives for data/list/read (the
    ``s3a://``/``gs://`` connectors Spark already uses for parquet), but
    the commit CAS is ONE service-arbitrated conditional PUT — atomic
    across drivers on different machines, which no rename on an object
    store is (module docstring). No temp file either: an object PUT is
    all-or-nothing, so a crash mid-publish leaves nothing at all."""

    def __init__(self, spark=None, client=None):
        super().__init__(spark)
        self._client = client

    def _resolve_client(self, uri: str):
        if self._client is None:
            scheme = (_SCHEME_RE.match(uri) or [None, ""])[1].lower()
            if scheme in ("s3", "s3a", "s3n"):
                self._client = S3ConditionalPutClient()
            elif scheme in ("gs", "gcs"):
                self._client = GcsConditionalPutClient()
            else:
                raise ValueError(
                    f"no conditional-put client for scheme of {uri!r}; pass client= "
                    "or register_log_store() a factory for this table prefix"
                )
        return self._client

    def publish_atomic(self, directory: str, name: str, content: str) -> bool:
        return self.publish_atomic_bytes(directory, name, content.encode("utf-8"))

    def publish_atomic_bytes(self, directory: str, name: str, content: bytes) -> bool:
        target = self.join(directory, name)
        return self._resolve_client(target).put_if_absent(target, content)

    def write_overwrite(self, directory: str, name: str, content: bytes) -> None:
        # hint files take an UNCONDITIONAL full-object put — an object
        # PUT is all-or-nothing, so readers never see a torn hint
        target = self.join(directory, name)
        self._resolve_client(target).put(target, content)


class S3ConditionalPutClient:
    """S3 conditional create: ``PutObject`` with ``If-None-Match: *`` —
    the service accepts exactly one creator per key (HTTP 412
    PreconditionFailed for losers; 409 ConditionalRequestConflict while
    a concurrent conditional write is in flight, which also means we
    lost unless the key is still absent). Public AWS API, also served by
    S3-compatible stores (MinIO, R2). boto3 is resolved lazily so the
    module imports in environments without it."""

    def __init__(self, boto3_client=None):
        if boto3_client is None:
            try:
                import boto3
            except ImportError as e:  # pragma: no cover - env without boto3
                raise RuntimeError(
                    "S3ConditionalPutClient needs boto3; pass boto3_client= or "
                    "register a custom ConditionalPutClient for this table prefix"
                ) from e
            boto3_client = boto3.client("s3")
        self._s3 = boto3_client

    @staticmethod
    def _bucket_key(uri: str) -> tuple[str, str]:
        rest = uri.split("://", 1)[1]
        bucket, _, key = rest.partition("/")
        if not bucket or not key:
            raise ValueError(f"not a bucket/key object URI: {uri!r}")
        return bucket, key

    def put_if_absent(self, uri: str, content: bytes) -> bool:
        bucket, key = self._bucket_key(uri)
        try:
            self._s3.put_object(Bucket=bucket, Key=key, Body=content, IfNoneMatch="*")
            return True
        except Exception as e:
            code = str(
                getattr(e, "response", {}).get("Error", {}).get("Code", "")
            ) or type(e).__name__
            if code in ("PreconditionFailed", "412"):
                return False
            if code in ("ConditionalRequestConflict", "409"):
                # a concurrent conditional PUT was in flight; whoever it
                # was, this attempt did not create the object
                return False
            raise

    def put(self, uri: str, content: bytes) -> None:
        bucket, key = self._bucket_key(uri)
        self._s3.put_object(Bucket=bucket, Key=key, Body=content)


class GcsConditionalPutClient:
    """GCS conditional create: upload with ``if_generation_match=0``
    (generation 0 = "object must not exist"); the service returns 412
    PreconditionFailed to every creator but one."""

    def __init__(self, gcs_client=None):
        if gcs_client is None:
            try:
                from google.cloud import storage
            except ImportError as e:  # pragma: no cover - env without the SDK
                raise RuntimeError(
                    "GcsConditionalPutClient needs google-cloud-storage; pass "
                    "gcs_client= or register a custom ConditionalPutClient"
                ) from e
            gcs_client = storage.Client()
        self._gcs = gcs_client

    def put_if_absent(self, uri: str, content: bytes) -> bool:
        bucket_name, _, key = uri.split("://", 1)[1].partition("/")
        blob = self._gcs.bucket(bucket_name).blob(key)
        try:
            blob.upload_from_string(content, if_generation_match=0)
            return True
        except Exception as e:
            if "412" in str(e) or type(e).__name__ == "PreconditionFailed":
                return False
            raise

    def put(self, uri: str, content: bytes) -> None:
        bucket_name, _, key = uri.split("://", 1)[1].partition("/")
        self._gcs.bucket(bucket_name).blob(key).upload_from_string(content)


class EmulatedConditionalPutClient:
    """Conditional-put semantics over local ``file:``/plain paths — the
    development/test stand-in for the S3/GCS clients (the environment
    has no object store). Faithful to the service contract the store
    relies on: ONE atomic full-object create-if-absent per key (the
    complete content appears or nothing does; exactly one concurrent
    creator wins), emulated with the same fsync+link(2) primitive
    LocalLogStore's CAS uses."""

    @staticmethod
    def _local_path(uri: str) -> str:
        from urllib.parse import urlparse

        u = urlparse(uri)
        if u.scheme not in ("", "file"):
            raise ValueError(f"EmulatedConditionalPutClient is local-only, got {uri!r}")
        return u.path if u.scheme else uri

    @staticmethod
    def _stage_tmp(directory: str, content: bytes) -> str:
        os.makedirs(directory, exist_ok=True)
        tmp = os.path.join(directory, f"{TMP_PREFIX}{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        return tmp

    def put_if_absent(self, uri: str, content: bytes) -> bool:
        directory, name = os.path.split(self._local_path(uri))
        tmp = self._stage_tmp(directory, content)
        try:
            os.link(tmp, os.path.join(directory, name))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def put(self, uri: str, content: bytes) -> None:
        """Unconditional full-object put (hint files, last-writer-wins):
        the complete content appears atomically via ``os.replace``."""
        directory, name = os.path.split(self._local_path(uri))
        tmp = self._stage_tmp(directory, content)
        os.replace(tmp, os.path.join(directory, name))
