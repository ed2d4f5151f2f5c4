"""Doc-mapper: JSON docs → typed rows, Quickwit semantics, Spark-first.

Replicates the behavior of quickwit-doc-mapper (doc_mapper_impl.rs:496-562,
mapping_tree.rs:163-265/849-874 — studied for behavior only):

- three modes: ``lenient`` (drop unmapped fields), ``strict`` (row error),
  ``dynamic`` (capture unmapped leaves into a ``_dynamic`` JSON column);
- per-type coercions (see FIXTURES.md F5): numeric strings coerce iff
  ``coerce=True`` (default), bools never coerce, ``null`` silently ignored,
  single-valued field given an array → error, arrays skip inner nulls,
  ``ip`` normalized to IPv6 form, ``bytes`` base64/hex, ``datetime`` per
  functions.datetime;
- ``partition_id`` evaluated from the routing expression over the raw doc;
- ``_doc_length`` = byte length of the serialized source;
- rows that fail land in a quarantine with Quickwit's outcome categories
  (doc_processor.rs:311-404): ``valid | json_parse_error | doc_mapper_error``.

The Spark integration is ``mapInPandas`` over batches of raw JSON lines —
document parsing is inherently row-wise, but everything downstream (the typed
columns) stays JVM-side. For typed-column feeds (the transcripts pipeline)
the doc-mapper is bypassed entirely; see pipeline/parse.py.
"""

from __future__ import annotations

import base64
import binascii
import ipaddress
import json
from dataclasses import dataclass, field
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from quickwit_spark.functions.datetime import (
    DEFAULT_INPUT_FORMATS,
    coerce_timestamp_pandas,
)
from quickwit_spark.routing import RoutingExpr

VALID = "valid"
JSON_PARSE_ERROR = "json_parse_error"
DOC_MAPPER_ERROR = "doc_mapper_error"
TRANSFORM_ERROR = "transform_error"

_SOURCE_COL = "_source"
_DYNAMIC_COL = "_dynamic"
_DOC_LENGTH_COL = "_doc_length"
_ERROR_COL = "_error"
_CATEGORY_COL = "_error_category"


@dataclass
class FieldMapping:
    name: str
    type: str  # text|u64|i64|f64|bool|ip|datetime|bytes|json|object|concatenate
    # tokenizer for text/concatenate fields (raw | default | ... —
    # functions/tokenizers.py names); drives query compilation via
    # QueryCompiler.from_doc_mapping
    tokenizer: str = "default"
    multi: bool = False
    coerce: bool = True
    # indexed=False (fast-only fields, qw_search_api setup `text_fast`) is
    # still searchable here (fast-field search) but rejected as a default
    # search field, matching the reference's build-time validation
    indexed: bool = True
    input_formats: tuple[str, ...] = DEFAULT_INPUT_FORMATS
    fast_precision: str = "seconds"
    input_format: str = "base64"  # for bytes: base64|hex
    fields: list["FieldMapping"] = field(default_factory=list)  # for object
    # for type="concatenate": the source fields whose values this virtual
    # field unions (field_mapping_entry.rs:662+; DateTime/Ip/Bytes excluded)
    source_fields: tuple[str, ...] = ()
    include_dynamic_fields: bool = True


@dataclass
class DocMapping:
    field_mappings: list[FieldMapping]
    mode: str = "dynamic"  # dynamic|lenient|strict
    timestamp_field: str | None = None
    partition_key: str = ""
    max_num_partitions: int = 200
    tag_fields: tuple[str, ...] = ()
    store_source: bool = False
    # dynamic_mapping.expand_dots (doc_mapping configs): a dotted dynamic key
    # like "k8s.pod.name" expands into nested objects instead of one flat key
    expand_dots: bool = False
    # dynamic_mapping.indexed (default true): whether dynamic captures are
    # searchable — gates default-search-field resolution onto `_dynamic`
    dynamic_indexed: bool = True
    # search_settings.default_search_fields (index-level, stored on the
    # mapping after create_index validates them)
    default_search_fields: tuple[str, ...] = ()
    # custom tokenizer entries from doc_mapping.tokenizers, canonicalized to
    # (name, sorted-json-config) pairs — the update-compat superset rule
    # (index_config/mod.rs:714-722) compares these sets
    tokenizers: tuple = ()
    # bumped by api.update_index whenever the mapping meaningfully changes
    # (DocMappingUid analog; index_config/mod.rs:698-703)
    doc_mapping_uid: int = 1

    @classmethod
    def from_config(cls, cfg: dict) -> "DocMapping":
        """Build from the reference's ``doc_mapping`` JSON/YAML shape (index
        create bodies, default_doc_mapper config parsing): ``field_mappings``
        entries with name/type/tokenizer/fields/concatenate_fields/
        input_formats, plus mode, timestamp_field, tag_fields, store_source,
        partition_key, max_num_partitions and dynamic_mapping.expand_dots.
        Array types use the reference's ``array<T>`` spelling
        (field_mapping_entry.rs type grammar)."""

        def field(entry: dict) -> FieldMapping:
            ftype = entry["type"]
            multi = False
            if ftype.startswith("array<") and ftype.endswith(">"):
                ftype, multi = ftype[6:-1], True
            kwargs: dict = {}
            if "tokenizer" in entry:
                kwargs["tokenizer"] = entry["tokenizer"]
            if "coerce" in entry:
                kwargs["coerce"] = bool(entry["coerce"])
            if "input_formats" in entry:
                kwargs["input_formats"] = tuple(entry["input_formats"])
            if "input_format" in entry:
                kwargs["input_format"] = entry["input_format"]
            if "indexed" in entry:
                kwargs["indexed"] = bool(entry["indexed"])
            if "fast_precision" in entry:
                kwargs["fast_precision"] = entry["fast_precision"]
            if ftype == "object":
                kwargs["fields"] = [field(e) for e in entry.get("field_mappings", [])]
            if ftype == "concatenate":
                kwargs["source_fields"] = tuple(entry.get("concatenate_fields", ()))
                kwargs["include_dynamic_fields"] = bool(
                    entry.get("include_dynamic_fields", True)
                )
            return FieldMapping(entry["name"], ftype, multi=multi, **kwargs)

        import json as _json

        dyn = cfg.get("dynamic_mapping") or {}
        toks = tuple(
            (t.get("name", ""), _json.dumps(t, sort_keys=True))
            for t in cfg.get("tokenizers", ())
        )
        return cls(
            tokenizers=toks,
            field_mappings=[field(e) for e in cfg.get("field_mappings", [])],
            mode=cfg.get("mode", "dynamic"),
            timestamp_field=cfg.get("timestamp_field"),
            partition_key=cfg.get("partition_key", ""),
            max_num_partitions=int(cfg.get("max_num_partitions", 200)),
            tag_fields=tuple(cfg.get("tag_fields", ())),
            store_source=bool(cfg.get("store_source", False)),
            expand_dots=bool(dyn.get("expand_dots", False)),
            dynamic_indexed=bool(dyn.get("indexed", True)),
        )


_SPARK_TYPES = {
    "text": T.StringType(),
    "u64": T.LongType(),
    "i64": T.LongType(),
    "f64": T.DoubleType(),
    "bool": T.BooleanType(),
    "ip": T.StringType(),
    "datetime": T.TimestampType(),
    "bytes": T.BinaryType(),
    "json": T.StringType(),
}


class DocMapperError(Exception):
    pass


def _spark_type(fm: FieldMapping) -> T.DataType:
    if fm.type == "object":
        inner = T.StructType([T.StructField(c.name, _spark_type(c), True) for c in fm.fields])
        return inner
    if fm.type == "concatenate":
        return T.ArrayType(T.StringType())
    base = _SPARK_TYPES[fm.type]
    return T.ArrayType(base) if fm.multi else base


def compile_schema(mapping: DocMapping) -> T.StructType:
    fields = [T.StructField(fm.name, _spark_type(fm), True) for fm in mapping.field_mappings]
    if mapping.mode == "dynamic":
        fields.append(T.StructField(_DYNAMIC_COL, T.StringType(), True))
    if mapping.store_source:
        fields.append(T.StructField(_SOURCE_COL, T.StringType(), True))
    fields += [
        T.StructField(_DOC_LENGTH_COL, T.LongType(), True),
        T.StructField("partition_id", T.LongType(), True),
        T.StructField(_ERROR_COL, T.StringType(), True),
        T.StructField(_CATEGORY_COL, T.StringType(), True),
    ]
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Per-value conversion (mapping_tree.rs:163-265 semantics)
# ---------------------------------------------------------------------------


def _convert_leaf(fm: FieldMapping, val: Any) -> Any:
    t = fm.type
    if t == "text":
        if isinstance(val, str):
            return val
        raise DocMapperError(f"expected JSON string, got `{json.dumps(val)}`")
    if t in ("u64", "i64", "f64"):
        if isinstance(val, bool):
            raise DocMapperError(f"expected JSON number, got `{json.dumps(val)}`")
        if isinstance(val, (int, float)):
            if t == "f64":
                return float(val)
            if isinstance(val, float) and not val.is_integer():
                raise DocMapperError(f"expected an integer, got `{val}`")
            iv = int(val)
            if t == "u64" and iv < 0:
                raise DocMapperError(f"expected u64, got negative `{iv}`")
            return iv
        if isinstance(val, str):
            if not fm.coerce:
                raise DocMapperError(
                    f"expected JSON number, got string `{val}`. enable coercion to {t} "
                    f"with the `coerce` parameter in the field mapping"
                )
            try:
                return float(val) if t == "f64" else int(val)
            except ValueError:
                raise DocMapperError(f'failed to coerce JSON string `"{val}"` to {t}') from None
        raise DocMapperError(f"expected JSON number, got `{json.dumps(val)}`")
    if t == "bool":
        if isinstance(val, bool):
            return val
        raise DocMapperError(f"expected JSON boolean, got `{json.dumps(val)}`")
    if t == "ip":
        if not isinstance(val, str):
            raise DocMapperError(f"expected JSON string for ip, got `{json.dumps(val)}`")
        try:
            addr = ipaddress.ip_address(val)
        except ValueError as e:
            raise DocMapperError(f"failed to parse IP address `{val}`: {e}") from None
        if isinstance(addr, ipaddress.IPv4Address):
            return f"::ffff:{addr}"  # IPv6-mapped form (mapping_tree.rs:240-248)
        return str(addr)
    if t == "bytes":
        if not isinstance(val, str):
            raise DocMapperError(f"expected base64/hex string, got `{json.dumps(val)}`")
        try:
            if fm.input_format == "hex":
                return binascii.unhexlify(val)
            return base64.b64decode(val, validate=True)
        except (binascii.Error, ValueError) as e:
            raise DocMapperError(f"failed to decode {fm.input_format} string: {e}") from None
    if t == "json":
        if isinstance(val, dict):
            return json.dumps(val, separators=(",", ":"))
        raise DocMapperError(f"expected JSON object, got `{json.dumps(val)}`")
    raise DocMapperError(f"unknown field type {t}")


def _convert_field(fm: FieldMapping, val: Any) -> Any:
    """Apply cardinality + null rules, then the leaf conversion."""
    if val is None:
        return None  # nulls silently ignored (mapping_tree.rs:346-349)
    if isinstance(val, list):
        if not fm.multi:
            raise DocMapperError(
                f"field `{fm.name}` is not multivalued, got an array"
            )  # MultiValuesNotSupported
        out = []
        for item in val:
            if item is None:
                continue  # nulls inside arrays skipped (:354-358)
            out.append(_convert_leaf(fm, item))
        return out
    converted = _convert_leaf(fm, val)
    return [converted] if fm.multi else converted


# ---------------------------------------------------------------------------
# DocMapper
# ---------------------------------------------------------------------------


def validate_tag_fields(mapping: DocMapping) -> None:
    """Tag-field validation at mapper build time (doc_mapper_impl.rs:310-354
    validate_tag; tag_fields/0001_allowed_types.yaml): tags are allowed only
    on raw-tokenized text and u64/i64 fields — tokenized text, f64, bool,
    json, ip, datetime, bytes and object make poor tags (representation
    multiplicity) and are hard 400s. Leading/trailing dots and unknown
    fields are rejected too."""
    declared = {fm.name: fm for fm in mapping.field_mappings}
    for name in mapping.tag_fields:
        if name.startswith(".") or name.startswith("\\."):
            raise ValueError(f"tag field `{name}` should not start with a `.`")
        if name.endswith("."):
            raise ValueError(f"tag field `{name}` should not end with a `.`")
        fm = declared.get(name)
        if fm is None:
            raise ValueError(f"unknown tag field: `{name}`")
        if fm.type == "text":
            if fm.tokenizer != "raw":
                raise ValueError(
                    "tags collection is only allowed on text fields with the "
                    "`raw` tokenizer"
                )
        elif fm.type not in ("u64", "i64"):
            raise ValueError(f"tags collection is not allowed on `{fm.type}` fields")


def validate_default_search_fields(
    mapping: DocMapping, fields: tuple[str, ...]
) -> None:
    """Default-search-field resolution at mapper build time
    (doc_mapper_impl.rs:245-262 — behavior and exact error strings,
    default_search_fields/0002 vectors):

    - a field resolves to a declared mapping (dotted paths descend object
      sub-mappings; any remainder under a ``json`` field resolves), else to
      the dynamic capture — but ONLY when no declared prefix shadows the
      path (``text.inner`` under a text field is unknown, not dynamic);
    - duplicates are rejected;
    - the resolved target must be indexed (``indexed: false`` fast-only
      fields and ``dynamic_mapping.indexed: false`` are 400s).
    """
    seen: set[str] = set()
    for name in fields:
        if name in seen:
            raise ValueError(f"duplicated default search field: `{name}`")
        seen.add(name)
        fm, shadowed = _resolve_mapped_path(mapping.field_mappings, name)
        if fm is not None:
            if not fm.indexed:
                raise ValueError(
                    f"default search field `{name}` is not indexed"
                )
            continue
        if shadowed or mapping.mode != "dynamic":
            raise ValueError(f"unknown default search field `{name}`")
        if not mapping.dynamic_indexed:
            raise ValueError(f"default search field `{name}` is not indexed")


def _resolve_mapped_path(fms: list[FieldMapping], path: str):
    """(FieldMapping | None, shadowed: bool) for a dotted search-field path.
    ``shadowed`` is True when a declared field matches a prefix of the path
    but cannot absorb the remainder — which blocks the dynamic fallback
    (tantivy find_field_with_default behavior)."""
    head, _, rest = path.partition(".")
    for fm in fms:
        if fm.name == path:
            return fm, False
        if fm.name == head and rest:
            if fm.type == "json":
                return fm, False  # json absorbs any sub-path
            if fm.type == "object":
                return _resolve_mapped_path(fm.fields, rest)
            return None, True  # scalar field shadows the sub-path
    return None, False


class DocMapper:
    def __init__(self, mapping: DocMapping):
        self.mapping = mapping
        validate_tag_fields(mapping)
        self.schema = compile_schema(mapping)
        self.routing = RoutingExpr(mapping.partition_key)
        self._datetime_fields = {
            fm.name: fm for fm in mapping.field_mappings if fm.type == "datetime"
        }

    # -- core row transform (pure Python; wrapped vectorized below) --------

    def _map_obj(self, fm_list: list[FieldMapping], obj: dict, out: dict, dynamic: dict):
        mapped = {fm.name: fm for fm in fm_list if fm.type != "concatenate"}
        for key, val in obj.items():
            fm = mapped.get(key)
            if fm is None:
                if self.mapping.mode == "strict":
                    raise DocMapperError(f"field `{key}` is not declared (strict mode)")
                if self.mapping.mode == "dynamic":
                    if self.mapping.expand_dots and "." in key:
                        cur = dynamic
                        parts = key.split(".")
                        for p in parts[:-1]:
                            nxt = cur.get(p)
                            if not isinstance(nxt, dict):
                                nxt = {}
                                cur[p] = nxt
                            cur = nxt
                        cur[parts[-1]] = val
                    else:
                        dynamic[key] = val
                continue  # lenient: drop
            if fm.type == "object":
                if val is None:
                    continue
                if not isinstance(val, dict):
                    raise DocMapperError(f"expected object for `{key}`")
                sub_out: dict = {}
                sub_dyn: dict = {}
                self._map_obj(fm.fields, val, sub_out, sub_dyn)
                out[key] = sub_out
                if sub_dyn:
                    dynamic[key] = sub_dyn
            elif fm.type == "datetime":
                out[key] = val  # coerced vectorized post-pass
            else:
                out[key] = _convert_field(fm, val)

    def parse_doc(self, raw: str | dict) -> dict:
        """Parse one document; returns a row dict following ``self.schema``."""
        row: dict[str, Any] = {f.name: None for f in self.schema.fields}
        if isinstance(raw, str):
            row[_DOC_LENGTH_COL] = len(raw.encode())
            try:
                obj = json.loads(raw)
            except (json.JSONDecodeError, ValueError) as e:
                row[_ERROR_COL] = f"failed to parse JSON document: {e}"
                row[_CATEGORY_COL] = JSON_PARSE_ERROR
                return row
            if not isinstance(obj, dict):
                row[_ERROR_COL] = "expected a JSON object"
                row[_CATEGORY_COL] = JSON_PARSE_ERROR
                return row
        else:
            obj = raw
            row[_DOC_LENGTH_COL] = len(json.dumps(obj, separators=(",", ":")).encode())

        row["partition_id"] = _to_i64(self.routing.eval_hash(obj))
        if self.mapping.store_source:
            row[_SOURCE_COL] = json.dumps(obj, separators=(",", ":"))

        out: dict = {}
        dynamic: dict = {}
        try:
            self._map_obj(self.mapping.field_mappings, obj, out, dynamic)
        except DocMapperError as e:
            row[_ERROR_COL] = str(e)
            row[_CATEGORY_COL] = DOC_MAPPER_ERROR
            return row
        for k, v in out.items():
            row[k] = v
        # concatenate virtual fields: union of stringified source values
        # (+ dynamic leaves when enabled) — field_mapping_entry.rs:662+,
        # values gathered as in mapping_tree.rs:267-328 (no datetime/ip/bytes)
        excluded_srcs = {
            f.name for f in self.mapping.field_mappings if f.type in ("datetime", "ip", "bytes")
        }
        for fm in self.mapping.field_mappings:
            if fm.type != "concatenate":
                continue
            gathered: list[str] = []

            def _gather(v):
                # JSON objects contribute their LEAF values recursively
                # (mapping_tree.rs:267-328: concat gathers json leaves, so
                # `concat_raw:nestedstring` hits — concat_fields vectors)
                for item in v if isinstance(v, list) else [v]:
                    if item is None:
                        continue
                    if isinstance(item, bool):
                        gathered.append("true" if item else "false")
                    elif isinstance(item, (str, int, float)):
                        gathered.append(str(item))
                    elif isinstance(item, dict):
                        for sub in item.values():
                            _gather(sub)

            for src in fm.source_fields:
                if src in excluded_srcs:
                    continue  # datetime/ip/bytes never feed concat fields
                _gather(obj.get(src))
            if fm.include_dynamic_fields:
                for v in dynamic.values():
                    _gather(v)
            row[fm.name] = gathered
        if self.mapping.mode == "dynamic":
            row[_DYNAMIC_COL] = json.dumps(dynamic, separators=(",", ":")) if dynamic else None
        row[_CATEGORY_COL] = VALID
        return row

    def parse_batch(self, docs: pd.Series) -> pd.DataFrame:
        """Parse a batch of raw JSON strings → pandas frame of typed rows.

        Row-wise JSON decode + tree walk, then *vectorized* datetime coercion
        and the timestamp-required check over the whole batch.
        """
        rows = [self.parse_doc(r) for r in docs]
        # dtype=object keeps large integers exact: the default constructor
        # promotes a None+int column to float64, silently rounding u64s above
        # 2^53 (the reference's "term aggs number precision" golden vector);
        # _arrow_safe then converts long columns to exact nullable Int64
        pdf = pd.DataFrame(
            rows, columns=[f.name for f in self.schema.fields], dtype=object
        )

        for name, fm in self._datetime_fields.items():
            vals = pdf[name]
            nanos, errs = coerce_timestamp_pandas(
                vals, input_formats=fm.input_formats, fast_precision=fm.fast_precision
            )
            ts = pd.to_datetime(nanos.astype("float") / 1e3, unit="us", utc=True)
            pdf[name] = ts.dt.tz_localize(None)
            bad = errs.notna() & pdf[_ERROR_COL].isna()
            pdf.loc[bad, _ERROR_COL] = errs[bad]
            pdf.loc[bad, _CATEGORY_COL] = DOC_MAPPER_ERROR

        ts_field = self.mapping.timestamp_field
        if ts_field is not None:
            missing = pdf[ts_field].isna() & pdf[_ERROR_COL].isna()
            pdf.loc[missing, _ERROR_COL] = (
                f"timestamp field `{ts_field}` is required but missing"
            )
            pdf.loc[missing, _CATEGORY_COL] = DOC_MAPPER_ERROR
        return pdf

    # -- Spark integration ---------------------------------------------------

    def apply(self, df: DataFrame, input_col: str = "value") -> DataFrame:
        """mapInPandas over raw JSON lines → typed DataFrame (this mapper's
        schema). Valid and quarantined rows share the frame; split with
        :func:`split_quarantine`."""
        schema = self.schema
        mapper = self

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = mapper.parse_batch(pdf[input_col])
                yield _arrow_safe(out, schema)

        return df.mapInPandas(run, schema=schema)

    def doc_to_json(self, row: dict) -> dict:
        """Reconstruct the JSON doc from a typed row (doc_mapper_impl.rs:574-599).

        Defines the text round-trip contract: text fields byte-identical.
        """
        obj: dict = {}
        for fm in self.mapping.field_mappings:
            v = row.get(fm.name)
            if v is None:
                continue
            if fm.type == "json" and isinstance(v, str):
                v = json.loads(v)
            elif fm.type == "bytes":
                vs = v if isinstance(v, list) else [v]
                enc = [
                    binascii.hexlify(x).decode()
                    if fm.input_format == "hex"
                    else base64.b64encode(x).decode()
                    for x in vs
                ]
                v = enc if isinstance(v, list) else enc[0]
            obj[fm.name] = v
        dyn = row.get(_DYNAMIC_COL)
        if dyn:
            for k, v in json.loads(dyn).items():
                obj.setdefault(k, v)
        return obj


def _to_i64(u: int) -> int:
    """u64 → i64 two's complement (Spark LongType is signed)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def _arrow_safe(pdf: pd.DataFrame, schema: T.StructType) -> pd.DataFrame:
    """Nudge object columns to Arrow-friendly dtypes per the Spark schema."""
    for f in schema.fields:
        if isinstance(f.dataType, T.LongType) and pdf[f.name].dtype == object:
            pdf[f.name] = pd.array(
                [None if v is None else int(v) for v in pdf[f.name]], dtype="Int64"
            )
    return pdf


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, quarantined_rows) — Catalyst reuses the parsed scan."""
    valid = df.filter(df[_ERROR_COL].isNull()).drop(_ERROR_COL, _CATEGORY_COL)
    bad = df.filter(df[_ERROR_COL].isNotNull())
    return valid, bad


def outcome_counts(df: DataFrame) -> DataFrame:
    """Quickwit's DocProcessor counters (doc_processor.rs:311-404) as a
    groupBy — `valid`, `doc_mapper_error`, `json_parse_error`, ... + bytes."""
    from pyspark.sql import functions as F

    return df.groupBy(F.col(_CATEGORY_COL).alias("outcome")).agg(
        F.count("*").alias("num_docs"),
        F.sum(_DOC_LENGTH_COL).alias("num_bytes"),
    )
