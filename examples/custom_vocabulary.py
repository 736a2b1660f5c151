"""A custom vocabulary + user metaschema, with $vocabulary gating.

The analogue of the reference's enumRef vocabulary flow
(/root/reference/examples/custom_keyword.py:56-61 + its
enumRef-metaschema/enumRef-vocabulary data files): bundle a custom
keyword into a vocabulary, author a metaschema that selects it alongside
the standard 2020-12 vocabularies, and validate specs that declare the
metaschema in ``$schema``.  A metaschema that does NOT select the
vocabulary demonstrates gating — the keyword degrades to an annotation.
"""
import pyarrow as pa
import pyarrow.compute as pc

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.evaluator import CKw, KwOut, compile_spec
from jschon_ray.vspec.extensions import register_keyword, unregister_keyword
from jschon_ray.vspec.metaschema import validate_spec
from jschon_ray.vspec.vocabulary import (
    create_metaschema,
    create_vocabulary,
    delete_metaschema,
)

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


V2020 = "https://json-schema.org/draft/2020-12/vocab/"

register_keyword("enumRef", instance_types=("string",), row_eval=row_eval,
                 compile_vec=compile_vec)

# 1. bundle the keyword into a vocabulary
create_vocabulary("https://example.com/enumRef", "enumRef")

# 2. a metaschema selecting the standard vocabularies plus enumRef
META_URI = "https://example.com/enumRef/enumRef-metaschema"
create_metaschema(META_URI, {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": META_URI,
    "$vocabulary": {
        V2020 + "core": True,
        V2020 + "applicator": True,
        V2020 + "unevaluated": True,
        V2020 + "validation": True,
        V2020 + "format-annotation": True,
        V2020 + "meta-data": True,
        V2020 + "content": True,
        "https://example.com/enumRef": True,
    },
    "$dynamicAnchor": "meta",
    "allOf": [{"$ref": "https://json-schema.org/draft/2020-12/schema"}],
    "properties": {"enumRef": {"type": "string"}},
})

# 3. a spec DECLARING the metaschema — enumRef is active
spec = {"$schema": META_URI,
        "$id": "https://example.com/clips-spec",
        "properties": {"codec": {"enumRef": "audio-codecs"}}}
validate_spec(spec)  # syntax-checked against the enumRef metaschema

table = pa.table({"codec": ["wav", "amr", "flac", None]})
cs = compile_spec(spec, table.schema, catalog=SpecCatalog())
valid, viols = cs.evaluate_table(table)
print("with enumRef vocabulary:", list(valid))       # amr fails

# 4. gating: a metaschema WITHOUT the enumRef vocabulary
PLAIN_URI = "https://example.com/enumRef/plain-metaschema"
create_metaschema(PLAIN_URI, {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": PLAIN_URI,
    "$vocabulary": {
        V2020 + "core": True,
        V2020 + "applicator": True,
        V2020 + "validation": True,
    },
    "$dynamicAnchor": "meta",
})
spec_plain = {"$schema": PLAIN_URI,
              "$id": "https://example.com/clips-spec-plain",
              "properties": {"codec": {"enumRef": "audio-codecs"}}}
cs2 = compile_spec(spec_plain, table.schema, catalog=SpecCatalog())
valid2, _ = cs2.evaluate_table(table)
print("without enumRef vocabulary:", list(valid2))   # all pass (annotation)

delete_metaschema(META_URI)
delete_metaschema(PLAIN_URI)
unregister_keyword("enumRef")
