"""Recursive NullType (VOID) scrubbing so DataFrames are Parquet-writable.

Reference operators P1/P2 (/root/reference/unload_databricks_data_to_s3.py:90-153)
define the semantics; this is a fresh implementation over Spark's type tree.

Semantics preserved exactly (SURVEY.md §2c, verified by the reference's own
schema test /root/reference/test/unload_databricks_data_to_s3_tests.py:36-99):

* top-level VOID column                      -> column dropped
* top-level array<void> / map<_, void>       -> column dropped
* struct whose fields are ALL void (recursively) -> NULL literal
* mixed struct                               -> void members removed, recursively
* array elements                             -> cleaned recursively; elements
  that become NULL after cleaning are dropped from the array (empty arrays stay [])
* map values void below top level            -> empty map (keys can't be void)
* map values struct/array/map               -> cleaned entry-wise

Deliberate deviations from the reference (all make output MORE writable, the
operator's whole purpose):

* reference returns ``F.lit(None)`` (itself VOID-typed) for an all-void
  struct, which still cannot be written to Parquet; we cast the NULL to
  string so the column survives the write.
* reference only prunes *direct* NullType struct fields, so a nested all-void
  struct resurfaces as a VOID-typed NULL field; we detect effective-voidness
  recursively.
* reference rebuilds NULL structs/maps as non-null empties (outer nullness
  lost); we preserve outer nullness with an isNull guard.

Everything is a computed projection over built-in higher-order functions
(struct / transform / filter / map_from_entries) — single narrow stage, fully
codegen'd, no UDFs, no shuffle; cost at 100 TB is the same columnar rewrite
Spark would do for any projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, NullType, StructType


def _is_effectively_void(dtype: DataType) -> bool:
    """True when a type carries no representable data at all: VOID itself, a
    struct of only-void fields, an array of void elements, or a map with void
    values."""
    if isinstance(dtype, NullType):
        return True
    if isinstance(dtype, StructType):
        return len(dtype.fields) > 0 and all(
            _is_effectively_void(f.dataType) for f in dtype.fields)
    if isinstance(dtype, ArrayType):
        return _is_effectively_void(dtype.elementType)
    if isinstance(dtype, MapType):
        return _is_effectively_void(dtype.valueType)
    return False


def _clean(col: Column, dtype: DataType) -> Column | None:
    """Rebuild ``col`` without void content. Returns None when nothing
    representable remains (caller decides: drop at top level, NULL inside a
    struct, filter out inside an array, empty-map for map values)."""
    if isinstance(dtype, NullType):
        return None

    if isinstance(dtype, StructType):
        kept: list[Column] = []
        for field in dtype.fields:
            cleaned = _clean(col.getField(field.name), field.dataType)
            if cleaned is not None:
                kept.append(cleaned.alias(field.name))
        if not kept:
            return None
        # Preserve outer-struct nullness: a NULL struct must stay NULL, not
        # become a struct of NULLs.
        return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*kept))

    if isinstance(dtype, ArrayType):
        if _is_effectively_void(dtype.elementType):
            return None
        if not _contains_void(dtype.elementType):
            return col
        cleaned = F.transform(col, lambda x: _clean(x, dtype.elementType))
        # Elements whose cleaned form is NULL are dropped (reference
        # behavior: arrays keep [] but lose null-cleaned elements).
        return F.filter(cleaned, lambda x: x.isNotNull())

    if isinstance(dtype, MapType):
        if _is_effectively_void(dtype.valueType):
            # Below top level a void-valued map becomes an EMPTY map of a
            # writable type (string->string), preserving map-ness.
            return F.when(
                col.isNull(), F.lit(None).cast("map<string,string>")
            ).otherwise(F.map_from_arrays(F.array(), F.array()).cast("map<string,string>"))
        if not _contains_void(dtype.valueType):
            return col
        entries = F.map_entries(col)
        rebuilt = F.transform(
            entries,
            lambda e: F.struct(
                e.getField("key").alias("key"),
                _clean(e.getField("value"), dtype.valueType).alias("value"),
            ),
        )
        return F.map_from_entries(rebuilt)

    return col


def _contains_void(dtype: DataType) -> bool:
    if isinstance(dtype, NullType):
        return True
    if isinstance(dtype, StructType):
        return any(_contains_void(f.dataType) for f in dtype.fields)
    if isinstance(dtype, ArrayType):
        return _contains_void(dtype.elementType)
    if isinstance(dtype, MapType):
        return _contains_void(dtype.valueType)
    return False


def drop_void_fields(df: DataFrame) -> DataFrame:
    """Drop/clean VOID content so ``df`` can be written as Parquet (P2)."""
    out: list[Column] = []
    changed = False
    for field in df.schema.fields:
        dtype = field.dataType
        # Top-level drop rules (reference P2): VOID columns, arrays of void,
        # void-valued maps vanish entirely. All-void STRUCTS are kept as a
        # NULL column instead (reference behavior).
        if isinstance(dtype, NullType) or (
            isinstance(dtype, (ArrayType,)) and _is_effectively_void(dtype.elementType)
        ) or (
            isinstance(dtype, MapType) and _is_effectively_void(dtype.valueType)
        ):
            changed = True  # drop whole column
            continue
        if not _contains_void(dtype):
            out.append(F.col(f"`{field.name}`"))
            continue
        changed = True
        cleaned = _clean(F.col(f"`{field.name}`"), dtype)
        if cleaned is None:
            # struct that collapsed to nothing -> NULL literal column of no
            # type is unwritable; reference turns it into a NULL (string) —
            # but at TOP level an all-void struct becomes a NULL literal
            # column; cast to string so parquet accepts it.
            out.append(F.lit(None).cast("string").alias(field.name))
        else:
            out.append(cleaned.alias(field.name))
    if not changed:
        return df
    return df.select(*out)
