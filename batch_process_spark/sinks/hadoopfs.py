"""Hadoop-FileSystem-API twins of the crash-safe directory swap.

``sinks.swapdir`` implements the never-destructive swap protocol with
``os``/``shutil`` — fine for local paths, wrong for a stored index that
lives on HDFS/S3 (the 100 TB deployment target the index docstrings
advertise). The index lifecycle ops (``ivf_delete`` cell rewrites,
``ivf_recluster`` whole-index swap, ``compact_index``) route their
listing / size / rename / delete calls through this wrapper instead, so
they work on whatever filesystem the index path resolves to — exactly
like ``write_index_meta`` already does for the meta file.

Protocol (identical to ``swapdir.swap_directory`` — see that module's
docstring for the crash-window analysis):

    1. rename(path, path + '.__old__')   # canonical data still intact
    2. rename(tmp, path)                 # new data takes the name
    3. delete(path + '.__old__')         # only now is anything deleted

``recover_swap_fs`` rolls a crashed swap forward or back
deterministically on the next writer startup.
"""

from __future__ import annotations

OLD_SUFFIX = ".__old__"


class HadoopFS:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` for the
    filesystem that ``path`` resolves to (HDFS / S3A / local alike).
    One JVM round-trip per call — these are metadata ops on a handful
    of directories, never per-row work."""

    def __init__(self, spark, path: str):
        self._jvm = spark._jvm
        self._fs = self._jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self.jpath(path)))

    def delete(self, path: str) -> None:
        """Recursive delete; no-op when absent (delete returns false)."""
        self._fs.delete(self.jpath(path), True)

    def rename(self, src: str, dst: str) -> None:
        """True rename with HDFS semantics. Hadoop's rename moves src
        INTO dst when dst is an existing directory — never what the
        swap protocol wants — so an existing destination is an error
        here, not a silent mis-nest."""
        if self._fs.exists(self.jpath(dst)):
            raise IOError(f"rename destination exists: {dst!r}")
        if not self._fs.rename(self.jpath(src), self.jpath(dst)):
            raise IOError(f"rename {src!r} -> {dst!r} failed")

    def read_utf8(self, path: str) -> str:
        """Whole-file UTF-8 read through the FS stream — driver-side,
        NO Spark job (a tiny meta file does not need a distributed
        scan). For a directory (the legacy ``df.write.text`` meta
        layout) the part files concatenate in name order."""
        p = self.jpath(path)
        if self._fs.getFileStatus(p).isDirectory():
            return "".join(
                self.read_utf8(f"{path}/{n}")
                for n in sorted(self.listdir(path))
                if n.startswith("part-")
            )
        stream = self._fs.open(p)
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_utf8(self, path: str, text: str) -> None:
        """Create/overwrite ``path`` with UTF-8 ``text`` through the FS
        stream — driver-side, no Spark job."""
        out = self._fs.create(self.jpath(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def mkdirs(self, path: str) -> None:
        """Create ``path`` (and parents); no-op when already present."""
        if not self._fs.mkdirs(self.jpath(path)):
            raise IOError(f"mkdirs {path!r} failed")

    def listdir(self, path: str) -> list[str]:
        """Child names (files and dirs) of ``path``."""
        return [
            st.getPath().getName() for st in self._fs.listStatus(self.jpath(path))
        ]

    def is_dir(self, path: str) -> bool:
        return bool(self._fs.getFileStatus(self.jpath(path)).isDirectory())

    def file_sizes(self, path: str, suffix: str = ".parquet") -> dict[str, int]:
        """{child file name: byte length} for data files under ``path``
        (one listStatus call — names and lengths come back together)."""
        return {
            st.getPath().getName(): int(st.getLen())
            for st in self._fs.listStatus(self.jpath(path))
            if not st.isDirectory() and st.getPath().getName().endswith(suffix)
        }


def swap_directory_fs(fs: HadoopFS, tmp: str, path: str) -> None:
    """``swapdir.swap_directory`` over the Hadoop FS API (single
    writer; ``path`` need not exist on the first write)."""
    old = path.rstrip("/") + OLD_SUFFIX
    if fs.exists(old):  # leftover from a crashed earlier swap
        fs.delete(old)
    if fs.exists(path):
        fs.rename(path, old)
    fs.rename(tmp, path)
    if fs.exists(old):
        fs.delete(old)


def recover_swap_fs(fs: HadoopFS, path: str, tmp: str | None = None) -> str:
    """``swapdir.recover_swap`` over the Hadoop FS API. Returns
    'clean' | 'rolled_forward' | 'rolled_back'."""
    old = path.rstrip("/") + OLD_SUFFIX
    if fs.exists(path):
        if fs.exists(old):
            fs.delete(old)
            return "rolled_forward"
        return "clean"
    if fs.exists(old):
        if tmp and fs.exists(tmp.rstrip("/") + "/_SUCCESS"):
            fs.rename(tmp, path)
            fs.delete(old)
            return "rolled_forward"
        fs.rename(old, path)
        return "rolled_back"
    if tmp and fs.exists(tmp.rstrip("/") + "/_SUCCESS"):
        fs.rename(tmp, path)
        return "rolled_forward"
    return "clean"
