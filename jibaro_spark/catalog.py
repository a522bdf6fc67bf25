"""Catalog — logical table coordinates → physical paths.

Re-creates the reference's path/layer abstraction
(``jibaro/datalake/path.py:7-61``): a table is addressed by
``(layer, project, database, table)`` and resolved to
``{protocol}://{bucket}/{project}/{database}/{table}``; streaming
checkpoints and history tables live under a control bucket with the
per-table convention
``.../_checkpoint/{bucket}/{project}/{db}/{table}`` and
``.../_history/{bucket}/{project}/{db}/{table}``
(reference ``path.py:28-61``).

Unlike the reference this is composition, not SparkSession subclassing:
the Catalog only produces strings; I/O lives in :mod:`jibaro_spark.io`.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

from jibaro_spark.config import Settings


class Layer(str, enum.Enum):
    """Medallion layers (reference ``path.py:17-21`` + semantics in
    ``cdc.py``): raw = opaque source bytes, staged = decoded typed
    records, curated = merged current state."""

    RAW = "raw"
    STAGED = "staged"
    CURATED = "curated"

    def __str__(self) -> str:  # noqa: D105
        return self.value


@dataclass(frozen=True)
class TableRef:
    """Logical coordinates of a table (reference ``path.py:7-14``)."""

    layer: str
    project: str
    database: str
    table: str

    def __post_init__(self) -> None:
        for part in (self.project, self.database, self.table):
            if not part or "/" in part:
                raise ValueError(f"invalid table coordinate: {part!r}")

    @property
    def qualified_name(self) -> str:
        return f"{self.layer}.{self.project}.{self.database}.{self.table}"

    def with_layer(self, layer: str | Layer) -> "TableRef":
        return TableRef(str(layer), self.project, self.database, self.table)


class Catalog:
    """Resolves :class:`TableRef` coordinates to physical paths.

    ``protocol`` defaults to ``file`` (tests) and is ``s3a``/``abfss``/
    ``gs`` in production — path construction is identical
    (reference ``path.py:22-25`` hardcodes ``s3a``).
    """

    def __init__(self, settings: Settings | None = None) -> None:
        self.settings = settings or Settings()

    def _mount(self, bucket: str, *parts: str) -> str:
        s = self.settings
        suffix = "/".join(parts)
        if s.protocol == "file":
            return f"{s.base_path}/{bucket}/{suffix}"
        return f"{s.protocol}://{bucket}/{suffix}"

    def path(self, ref: TableRef) -> str:
        """Data path for a table (reference ``path.py:7-25``)."""
        bucket = self.settings.bucket_for(str(ref.layer))
        return self._mount(bucket, ref.project, ref.database, ref.table)

    def checkpoint_path(self, ref: TableRef) -> str:
        """Streaming checkpoint path under the control bucket
        (reference ``path.py:28-47``; auto-injected at
        ``streaming.py:60-62``)."""
        bucket = self.settings.bucket_for(str(ref.layer))
        control = self.settings.bucket_for("control")
        return self._mount(
            control, "_checkpoint", bucket, ref.project, ref.database, ref.table
        )

    def history_path(self, ref: TableRef) -> str:
        """Per-table maintenance-metrics table path
        (reference ``path.py:50-61``, written at ``cdc.py:224-247``)."""
        bucket = self.settings.bucket_for(str(ref.layer))
        control = self.settings.bucket_for("control")
        return self._mount(
            control, "_history", bucket, ref.project, ref.database, ref.table
        )

    def ref(self, layer: str | Layer, project: str, database: str, table: str) -> TableRef:
        return TableRef(str(layer), project, database, table)
