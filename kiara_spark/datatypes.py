"""Data type registry.

The reference registers named data types via entry points
(``pyproject.toml:129-145``; classes in ``src/kiara/data_types/``).  Each type
knows how to validate, serialize and hash its payload.  Here types are a small
registry of classes with the same responsibilities, with the key Spark mapping
(SURVEY §1.2): ``table`` -> DataFrame, ``array`` -> single-column DataFrame,
``file``/``file_bundle`` -> binary DataFrames, scalars -> driver objects.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame


class DataTypeError(ValueError):
    pass


class DataType:
    """Base type plugin (reference ``src/kiara/data_types/__init__.py:135-499``)."""

    name: str = "any"

    def validate(self, data: Any) -> Any:
        """Parse/validate raw input; return normalized payload."""
        return data

    def serialize(self, data: Any, path: str) -> None:
        raise NotImplementedError

    def deserialize(self, spark, path: str) -> Any:
        raise NotImplementedError


class NoneType(DataType):
    name = "none"

    def validate(self, data):
        if data is not None:
            raise DataTypeError("'none' value must be None")
        return None


class AnyType(DataType):
    name = "any"


class InternalType(DataType):
    """Root of the engine-internal family (reference
    ``data_types/included_core_types/internal/__init__.py`` — types
    "predominantly used internally", excluded from user-facing listings by
    default).  ``KiaraAPI.is_internal_data_type`` keys off this class."""

    name = "internal"


class InternalModelType(InternalType):
    """A registered internal model payload (reference ``internal_model``)."""

    name = "internal_model"


class DocType(InternalType):
    """Documentation metadata attached to items (reference ``doc``)."""

    name = "doc"


class RenderSceneType(InternalType):
    """A render-scene instruction tree (reference ``render_scene``)."""

    name = "render_scene"


class RenderValueResultType(InternalType):
    """The result payload of a render_value operation (reference
    ``render_value_result`` — here the table_page/related_scenes dict)."""

    name = "render_value_result"


class TerminalRenderableType(InternalType):
    """A terminal-renderable payload (reference ``terminal_renderable``)."""

    name = "terminal_renderable"


class StringType(DataType):
    name = "string"

    def __init__(self, allowed_strings: list[str] | None = None):
        self.allowed_strings = allowed_strings

    def validate(self, data):
        if not isinstance(data, str):
            raise DataTypeError(f"expected str, got {type(data).__name__}")
        if self.allowed_strings and data not in self.allowed_strings:
            raise DataTypeError(f"{data!r} not in allowed: {self.allowed_strings}")
        return data


class BooleanType(DataType):
    """Parses 0/1/"true"/"false" like the reference
    (``included_core_types/__init__.py:328-340``)."""

    name = "boolean"

    def validate(self, data):
        if isinstance(data, bool):
            return data
        if isinstance(data, int) and data in (0, 1):
            return bool(data)
        if isinstance(data, str):
            low = data.strip().lower()
            if low in ("true", "yes", "1"):
                return True
            if low in ("false", "no", "0"):
                return False
        raise DataTypeError(f"cannot parse boolean from {data!r}")


class IntegerType(DataType):
    name = "integer"

    def validate(self, data):
        if isinstance(data, bool) or not isinstance(data, int):
            try:
                return int(data)
            except (TypeError, ValueError):
                raise DataTypeError(f"cannot parse integer from {data!r}")
        return data


class FloatType(DataType):
    name = "float"

    def validate(self, data):
        try:
            return float(data)
        except (TypeError, ValueError):
            raise DataTypeError(f"cannot parse float from {data!r}")


class BytesType(DataType):
    name = "bytes"

    def validate(self, data):
        if not isinstance(data, (bytes, bytearray)):
            raise DataTypeError("expected bytes")
        return bytes(data)


class DictType(DataType):
    name = "dict"

    def validate(self, data):
        if not isinstance(data, dict):
            raise DataTypeError("expected dict")
        return data


class TableType(DataType):
    """THE core mapping: kiara 'table' (Arrow-columnar in the tabular plugin)
    -> Spark DataFrame."""

    name = "table"

    def validate(self, data):
        if not isinstance(data, DataFrame):
            raise DataTypeError("expected a pyspark DataFrame")
        return data

    def serialize(self, data: DataFrame, path: str) -> None:
        data.write.mode("overwrite").parquet(path)

    def deserialize(self, spark, path: str) -> DataFrame:
        return spark.read.parquet(path)


class ArrayType(TableType):
    """kiara 'array' -> single-column DataFrame."""

    name = "array"


class FileType(DataType):
    """kiara 'file' -> driver-side descriptor; bulk reads go through
    ``spark.read.format('binaryFile')`` (see operators/filesystem.py)."""

    name = "file"

    def validate(self, data):
        from .operators.filesystem import KiaraFile

        if not isinstance(data, KiaraFile):
            raise DataTypeError("expected KiaraFile")
        return data


class FileBundleType(DataType):
    """kiara 'file_bundle' -> DataFrame of (rel_path, content, metadata)."""

    name = "file_bundle"

    def validate(self, data):
        if not isinstance(data, DataFrame):
            raise DataTypeError("expected a file-bundle DataFrame")
        required = {"rel_path", "content"}
        if not required.issubset(set(data.columns)):
            raise DataTypeError(f"bundle df needs columns {required}")
        return data


class DatabaseType(DataType):
    """kiara 'database' (plugin type, SURVEY §1.2) -> a namespace of
    DataFrames: dict table-name -> DataFrame, queried through the Spark SQL
    catalog."""

    name = "database"

    def validate(self, data):
        if not isinstance(data, dict) or not all(
            isinstance(v, DataFrame) for v in data.values()
        ):
            raise DataTypeError("expected dict[str, DataFrame]")
        return data


class NetworkGraphType(DataType):
    """kiara 'network_graph' (plugin type, SURVEY §1.2) -> node + edge
    DataFrames (the GraphFrames shape): {'nodes': df(id,...),
    'edges': df(src, dst, ...)}."""

    name = "network_graph"

    def validate(self, data):
        if (
            not isinstance(data, dict)
            or "edges" not in data
            or not isinstance(data["edges"], DataFrame)
            or not {"src", "dst"}.issubset(data["edges"].columns)
        ):
            raise DataTypeError(
                "expected {'edges': df(src, dst, ...), 'nodes': df(id, ...)?}")
        if "nodes" in data and not isinstance(data["nodes"], DataFrame):
            raise DataTypeError("nodes must be a DataFrame")
        return data


class TypeRegistry:
    def __init__(self):
        self._types: dict[str, Callable[..., DataType]] = {}
        for cls in (
            NoneType, AnyType, StringType, BooleanType, IntegerType, FloatType,
            BytesType, DictType, TableType, ArrayType, FileType, FileBundleType,
            DatabaseType, NetworkGraphType,
            InternalType, InternalModelType, DocType, RenderSceneType,
            RenderValueResultType, TerminalRenderableType,
        ):
            self.register(cls)

    def register(self, cls: type[DataType]) -> None:
        self._types[cls.name] = cls

    def get(self, name: str, **type_config) -> DataType:
        if name not in self._types:
            raise DataTypeError(f"unknown data type: {name!r}")
        try:
            return self._types[name](**type_config)
        except TypeError:
            return self._types[name]()

    @property
    def type_names(self) -> list[str]:
        return sorted(self._types)
