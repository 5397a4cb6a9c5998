"""Filesystem plumbing for commit protocols.

``HadoopFS`` is the small Hadoop ``FileSystem`` wrapper the resumable
pipeline uses for manifest IO (moved here from pipelines/corpus.py so
the protocol and its failure-mode shim live together). Local paths
route through Hadoop's RawLocalFileSystem, hdfs:///s3a:// through their
connectors — one code path for tests and clusters.

``S3LikeFS`` is the round-6 object-store simulator: RawLocalFileSystem
everywhere EXCEPT the primitives whose semantics differ on object
stores, so the write-then-publish manifest protocol can be *observed*
(not argued) under those semantics:

- **non-atomic rename**: object stores have no rename; s3a implements
  it as copy-then-delete. The shim's ``_rename`` does exactly that
  through the same Hadoop create/open/delete calls, with an injectable
  crash (a) before the copy, (b) mid-copy — destination left TORN, the
  harshest model (real S3 PUTs are atomic so a torn object needs a
  multipart/wasb-style store, but a protocol safe under torn writes is
  safe under both) — or (c) between the copy and the delete (complete
  destination + leftover source).
- **delayed listing visibility**: legacy eventually-consistent stores
  could miss freshly-written keys in listings. ``list_delay=N`` makes
  the first N ``exists()`` probes of any path answer False even though
  the file is there.

The crash is delivered as ``InjectedCrash`` raised mid-protocol and
the pipeline call abandoned — byte-for-byte the on-disk state a
process death at that point leaves behind, which is what the resume
logic actually consumes.
"""

from __future__ import annotations

import json


class InjectedCrash(RuntimeError):
    """Raised by S3LikeFS at the armed crash point; the test harness's
    stand-in for process death mid-rename (identical on-disk state)."""


class HadoopFS:
    """Manifest IO through the Hadoop FileSystem API, so the resumable
    pipeline works on the paths its 100 TB target actually uses
    (hdfs://, s3a://, ...) and not only the local filesystem (r5
    review: os.path/open manifests crashed on any URI scheme AFTER
    paying the stage compute). Local paths route through Hadoop's
    RawLocalFileSystem, so one code path serves tests and clusters."""

    def __init__(self, spark, path: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._path_cls = jvm.org.apache.hadoop.fs.Path
        p = self._path_cls(path)
        self.fs = p.getFileSystem(spark._jsc.hadoopConfiguration())

    def exists(self, path: str) -> bool:
        return self.fs.exists(self._path_cls(path))

    def delete(self, path: str) -> None:
        self.fs.delete(self._path_cls(path), True)

    def mkdirs(self, path: str) -> None:
        self.fs.mkdirs(self._path_cls(path))

    def _read_bytes(self, path: str) -> bytes:
        stream = self.fs.open(self._path_cls(path))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def _write_bytes(self, path: str, data: bytes) -> None:
        out = self.fs.create(self._path_cls(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def read_json(self, path: str) -> dict:
        return json.loads(self._read_bytes(path).decode("utf-8"))

    def _rename(self, src: str, dst: str) -> bool:
        """The publish primitive — atomic on HDFS/posix; S3LikeFS
        overrides this with copy-then-delete semantics. Hadoop's
        FileSystem.rename reports most failures through its BOOLEAN
        return, not an exception — callers must check it."""
        return bool(self.fs.rename(self._path_cls(src), self._path_cls(dst)))

    def write_json_atomic(self, path: str, payload: dict) -> None:
        """write to .tmp, then rename over the target — atomic on HDFS
        and posix; on object stores without atomic rename the window is
        a re-done publish, never a half-read by the MANIFEST PROTOCOL
        (torn or missing manifests read as 'not done' — observed under
        S3LikeFS in tests/test_objectstore_sim.py, not argued). The tmp
        name is underscore-prefixed so Spark readers ignore it.

        The pre-publish delete is UNCONDITIONAL — the protocol rule
        _materialize_stage learned from the delayed-listing test: an
        exists() probe lies on stores whose listings lag writes (and a
        raw-fs probe is invisible to the S3LikeFS shim), while delete
        on a missing path is a no-op. A rename returning false (e.g.
        destination recreated by a concurrent writer on HDFS-semantics
        stores) raises instead of silently losing the publish."""
        tmp = path + ".tmp"
        self._write_bytes(tmp, json.dumps(payload).encode("utf-8"))
        self.delete(path)
        if not self._rename(tmp, path):
            raise IOError(
                f"manifest publish failed: rename {tmp} -> {path} "
                "returned false"
            )


class S3LikeFS(HadoopFS):
    """HadoopFS with object-store rename/listing semantics + injectable
    crash — see the module docstring.

    ``crash``: None | "before_copy" | "mid_copy" | "after_copy";
    fires on the ``crash_on_rename``-th rename (1-based), once.
    ``list_delay``: first N exists() probes per path answer False.
    """

    def __init__(
        self,
        spark,
        path: str,
        crash: "str | None" = None,
        crash_on_rename: int = 1,
        list_delay: int = 0,
    ):
        super().__init__(spark, path)
        valid = (None, "before_copy", "mid_copy", "after_copy")
        if crash not in valid:
            raise ValueError(f"crash must be one of {valid}, got {crash!r}")
        self.crash = crash
        self.crash_on_rename = crash_on_rename
        self.list_delay = list_delay
        self.renames = 0
        self._probe_counts: dict[str, int] = {}

    def exists(self, path: str) -> bool:
        real = super().exists(path)
        if real and self.list_delay > 0:
            seen = self._probe_counts.get(path, 0)
            self._probe_counts[path] = seen + 1
            if seen < self.list_delay:
                return False
        return real

    def _rename(self, src: str, dst: str) -> bool:
        self.renames += 1
        armed = self.crash is not None and self.renames == self.crash_on_rename
        if armed and self.crash == "before_copy":
            raise InjectedCrash(f"crash before copy: {src} -> {dst}")
        data = self._read_bytes(src)
        if armed and self.crash == "mid_copy":
            # the harsh store model: destination visible but TORN
            self._write_bytes(dst, data[: max(1, len(data) // 2)])
            raise InjectedCrash(f"crash mid-copy (torn destination): {dst}")
        self._write_bytes(dst, data)
        if armed and self.crash == "after_copy":
            raise InjectedCrash(f"crash after copy, before source delete: {src}")
        self.fs.delete(self._path_cls(src), False)
        return True  # copy+delete either raised or fully succeeded
