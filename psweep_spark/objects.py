"""Arbitrary-Python-object params — the cloudpickle BinaryType escape
hatch (SURVEY §1.4; reference behavior at
``/root/reference/tests/test_all.py:1360-1437`` — psets holding
``np.sin``, classes, instances, functions round-trip through run() and
re-hash to the stored ``_pset_hash``).

The reference gets this for free from pandas ``dtype=object`` +
``joblib.hash`` (pickle-based).  This engine's typed core instead stores
such values in a ``BinaryType`` column whose cells are framed as::

    MAGIC (8 bytes) + cloudpickle.dumps(value)

and the canonical hash stays **value-wise** (``hashing.canon_value``):
an un-typable object encodes as ``"p:" + hex(cloudpickle bytes)``, while
a string/float that happens to live in a pickled column still encodes as
its native ``s:``/``d:`` form after unpickling — so
``pset_hash(df_extract_pset(...)) == stored _pset_hash`` holds exactly
like the reference contract, independent of column typing.

Determinism caveat (same as the reference's joblib re-pickle): hash
stability across *processes* is guaranteed for objects picklable by
reference (module-level functions/classes, numpy ufuncs); dynamically
defined objects (lambdas, ``__main__`` classes) are stable within a
driver process.

cloudpickle ships inside pyspark — no extra dependency.
"""

from __future__ import annotations

from pyspark import cloudpickle

#: Cell framing for pickled values.  8 bytes, versioned; a genuine
#: user ``bytes`` param starting with this prefix would be mis-detected
#: as pickled — documented improbable collision.
MAGIC = b"PSWPKL1\x00"

#: StructField.metadata key marking a column as pickled-object storage.
META_KEY = "psweep_pickled"


def obj_to_bytes(v) -> bytes:
    """value → framed cloudpickle cell."""
    return MAGIC + cloudpickle.dumps(v)


def is_pickled_bytes(b) -> bool:
    return isinstance(b, (bytes, bytearray)) and bytes(b[: len(MAGIC)]) == MAGIC


def obj_from_bytes(b):
    return cloudpickle.loads(bytes(b)[len(MAGIC):])


def maybe_unpickle(v):
    """Framed cell → original object; anything else passes through."""
    if is_pickled_bytes(v):
        return obj_from_bytes(v)
    return v


def pickled_cols(schema) -> set[str]:
    """Names of columns marked as pickled-object storage."""
    return {
        f.name
        for f in schema.fields
        if f.metadata and f.metadata.get(META_KEY)
    }
