"""A custom assertion keyword, both execution paths.

The analogue of the reference's EnumRef example
(/root/reference/examples/custom_keyword.py:25-61): `enumRef` resolves a
named value-set from an external registry. Here the registry is a plain
dict; `row_eval` gives exact per-row semantics and `compile_vec` the
vectorized Arrow path.
"""
import pyarrow as pa
import pyarrow.compute as pc

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.evaluator import CKw, Entry, KwOut, compile_spec
from jschon_ray.vspec.extensions import register_keyword, unregister_keyword

SETS = {"audio-codecs": ["pcm_s16le", "wav", "flac", "opus", "mp3"]}


def row_eval(ctx):
    values = SETS.get(ctx.kval, [])
    if ctx.instance not in values:
        ctx.node.fail(f"The value must be one of the {ctx.kval!r} set")


def compile_vec(site, kval, compiler):
    values = pa.array(SETS.get(kval, []))
    msg = f"The value must be one of the {kval!r} set"

    class EnumRefCKw(CKw):
        key = "enumRef"

        def evaluate(self, inst, siblings):
            member = pc.is_in(inst.values, value_set=values)
            ok = pc.fill_null(member, False).to_numpy(zero_copy_only=False)
            ok = ok | ~inst.present
            fails = ~ok
            entries = [self.entry(fails, inst.loc, msg)] if fails.any() else []
            return KwOut(ok, entries=entries)

    return EnumRefCKw(site)


register_keyword("enumRef", instance_types=("string",), row_eval=row_eval,
                 compile_vec=compile_vec)

table = pa.table({"codec": ["wav", "amr", "flac", None]})
spec = {"$id": "https://example.com/enumref",
        "properties": {"codec": {"enumRef": "audio-codecs"}}}
cs = compile_spec(spec, table.schema, catalog=SpecCatalog())
valid, viols = cs.evaluate_table(table)
for i in range(table.num_rows):
    print(table["codec"][i].as_py(), bool(valid[i]),
          [v["error"] for v in viols[i]])
unregister_keyword("enumRef")
