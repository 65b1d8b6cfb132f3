"""Filesystem shim for sink markers/manifests: local ``os`` fast path,
Hadoop ``FileSystem`` API for scheme-qualified paths.

The exactly-once parquet sink keeps its commit markers and lineage
manifests beside the data. Data moves through Spark writers (which
already speak any Hadoop scheme — ``s3a://``, ``hdfs://``, ``file://``),
but the marker I/O used plain ``os``/``open`` and therefore pinned the
sink to the local disk. This shim routes marker I/O through the JVM's
``org.apache.hadoop.fs.FileSystem`` (the same client Spark's own
committers use; the reference instead holds an AWS SDK client,
``/root/reference/integrations/sinks/sink_s3.go:30-63``) whenever the
sink path carries a scheme, so the sink runs unchanged against HDFS or
S3A once the cluster provides the hadoop-aws jars + credentials.

Commit-marker atomicity by store:

- local / HDFS: write to ``<marker>.tmp`` then rename — atomic.
- S3A: rename is copy+delete (not atomic), but a single-object PUT is
  atomic-visible, so remote writes go DIRECTLY to the final key in one
  ``create(overwrite=True)`` call — same commit point, different
  mechanism. (Epoch re-delivery overwrites the marker with identical
  content, so even the overwrite case is idempotent.)

Sandbox note: no object store or credentials exist here; the Hadoop
path is exercised with ``file:`` URIs in tests, which runs the exact
JVM code path minus the network.
"""

from __future__ import annotations

import json
import os


def is_hadoop_path(path: str) -> bool:
    return "://" in path


def _jvm_fs(spark, path: str):
    jvm = spark._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    return jpath.getFileSystem(conf), jpath, jvm


class SinkFS:
    """Marker/manifest I/O for one sink root. ``spark`` is only needed
    (lazily) for scheme-qualified roots."""

    def __init__(self, root: str, spark=None):
        self.root = root
        self.remote = is_hadoop_path(root)
        self._spark = spark

    def _fs(self, path: str):
        from pyspark.sql import SparkSession

        spark = self._spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(f"no SparkSession for Hadoop path {path!r}")
        return _jvm_fs(spark, path)

    # -- primitives ------------------------------------------------------

    def exists(self, path: str) -> bool:
        if not self.remote:
            return os.path.exists(path)
        fs, jpath, _ = self._fs(path)
        return fs.exists(jpath)

    def read_json(self, path: str) -> dict:
        if not self.remote:
            with open(path) as f:
                return json.load(f)
        fs, jpath, jvm = self._fs(path)
        stream = fs.open(jpath)
        try:
            # Py4J copies a Python bytearray INTO Java, so Java-side
            # reads into it are invisible here; commons-io (on Spark's
            # classpath) drains the stream Java-side and returns byte[]
            data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        return json.loads(data.decode())

    def write_json_atomic(self, path: str, obj: dict) -> None:
        """The commit point. Local/HDFS: tmp + rename (atomic). Remote
        object store: direct single-object create (PUT is atomic-visible;
        see module docstring)."""
        payload = json.dumps(obj).encode()
        if not self.remote:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(payload.decode())
            os.replace(tmp, path)
            return
        fs, jpath, _ = self._fs(path)
        out = fs.create(jpath, True)
        try:
            out.write(payload)
        finally:
            out.close()

    def list_json(self, dir_path: str) -> list[str]:
        """Sorted basenames of ``*.json`` directly under ``dir_path``
        (empty when absent)."""
        if not self.remote:
            if not os.path.isdir(dir_path):
                return []
            return sorted(n for n in os.listdir(dir_path) if n.endswith(".json"))
        fs, jpath, _ = self._fs(dir_path)
        if not fs.exists(jpath):
            return []
        out = []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.endswith(".json"):
                out.append(name)
        return sorted(out)

    def join(self, *parts: str) -> str:
        if not self.remote:
            return os.path.join(*parts)
        return "/".join(p.rstrip("/") for p in parts)

    def partition_stats(self, epoch_dir: str) -> dict:
        """{relative-partition-dir: {files, bytes}} for the committed
        parquet files under one epoch dir (lineage manifest input)."""
        out: dict[str, dict] = {}
        if not self.remote:
            for root, _dirs, files in os.walk(epoch_dir):
                pq = [f for f in files if f.endswith(".parquet")]
                if not pq:
                    continue
                rel = os.path.relpath(root, epoch_dir)
                out[rel] = {
                    "files": len(pq),
                    "bytes": sum(
                        os.path.getsize(os.path.join(root, f)) for f in pq
                    ),
                }
            return out
        fs, jroot, jvm = self._fs(epoch_dir)
        if not fs.exists(jroot):
            return out
        it = fs.listFiles(jroot, True)  # recursive
        root_uri = jroot.toUri().getPath()
        while it.hasNext():
            st = it.next()
            p = st.getPath()
            if not p.getName().endswith(".parquet"):
                continue
            parent = p.getParent().toUri().getPath()
            rel = os.path.relpath(parent, root_uri)
            d = out.setdefault(rel, {"files": 0, "bytes": 0})
            d["files"] += 1
            d["bytes"] += st.getLen()
        return out
