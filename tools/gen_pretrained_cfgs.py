"""Extract the reference zoo's pretrained-cfg metadata into a JSON db.

Walks every reference model file's `default_cfgs = generate_default_cfgs(
{...})` table and `register_model_deprecations(...)` call with the `ast`
module (no reference code is executed or copied — this is config DATA:
input sizes, crop percentages, normalization stats, tag names, URLs).
Per-file `_cfg(...)` default kwargs are resolved from each file's `_cfg`
definition so entries carry complete metadata.

Output: vision_transformers_torch_xla_tpu/models/pretrained_cfgs.json
  {"cfgs": {model: {tag: {...}}}, "deprecations": {old: new}}

Run:  python tools/gen_pretrained_cfgs.py
"""
import ast
import json
import os

REF = "/root/reference/models"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "vision_transformers_torch_xla_tpu", "models",
                   "pretrained_cfgs.json")

CONSTS = {
    "IMAGENET_DEFAULT_MEAN": (0.485, 0.456, 0.406),
    "IMAGENET_DEFAULT_STD": (0.229, 0.224, 0.225),
    "IMAGENET_INCEPTION_MEAN": (0.5, 0.5, 0.5),
    "IMAGENET_INCEPTION_STD": (0.5, 0.5, 0.5),
    "OPENAI_CLIP_MEAN": (0.48145466, 0.4578275, 0.40821073),
    "OPENAI_CLIP_STD": (0.26862954, 0.26130258, 0.27577711),
    "IMAGENET_DPN_MEAN": (0.48627451, 0.45882353, 0.40784314),
    "IMAGENET_DPN_STD": (0.23482446, 0.23482446, 0.23482446),
}


def lit(node):
    """Literal-or-known-constant eval; None if unresolvable."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, (ast.Tuple, ast.List)):
        vals = [lit(e) for e in node.elts]
        return None if any(v is None and not isinstance(e, ast.Constant)
                           for v, e in zip(vals, node.elts)) else tuple(vals)
    if isinstance(node, ast.Name) and node.id in CONSTS:
        return CONSTS[node.id]
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Div):
        l, r = lit(node.left), lit(node.right)
        if isinstance(l, (int, float)) and isinstance(r, (int, float)):
            return l / r
    return None


def file_cfg_defaults(tree):
    """Per-file `_cfg` defaults: the dict literal it returns + kwarg
    defaults in the signature."""
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "_cfg":
            base = {}
            args = node.args
            kw_names = [a.arg for a in args.args]
            defaults = args.defaults
            for name, d in zip(kw_names[len(kw_names) - len(defaults):],
                               defaults):
                v = lit(d)
                if v is not None:
                    base[name] = v
            for sub in ast.walk(node):
                if isinstance(sub, ast.Return):
                    target = sub.value
                    if isinstance(target, ast.Call):
                        # return {..., **kwargs} wrapped in dict() or {..}
                        target = next((a for a in target.args
                                       if isinstance(a, ast.Dict)), None)
                    if isinstance(target, ast.Dict):
                        for k, v in zip(target.keys, target.values):
                            if isinstance(k, ast.Constant):
                                val = lit(v)
                                if val is not None:
                                    base[k.value] = val
                    break
            return base
    return {}


def extract(path):
    src = open(path, encoding="utf-8", errors="replace").read()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {}, {}
    base = file_cfg_defaults(tree)
    # dict literals assigned to module-level names (the dict may be built
    # first and passed to generate_default_cfgs by name)
    named_dicts = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1 and \
                isinstance(node.targets[0], ast.Name) and \
                isinstance(node.value, ast.Dict):
            named_dicts[node.targets[0].id] = node.value
    cfgs = {}
    deps = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            fn = node.func
            fname = getattr(fn, "id", getattr(fn, "attr", ""))
            if fname == "generate_default_cfgs" and node.args:
                d = node.args[0]
                if isinstance(d, ast.Name):
                    d = named_dicts.get(d.id)
                if not isinstance(d, ast.Dict):
                    continue
                for k, v in zip(d.keys, d.values):
                    if not isinstance(k, ast.Constant):
                        continue
                    key = k.value
                    entry = dict(base)
                    if isinstance(v, ast.Call):
                        for kw in v.keywords:
                            val = lit(kw.value)
                            if kw.arg and val is not None:
                                entry[kw.arg] = val
                        if v.args:
                            url = lit(v.args[0])
                            if url:
                                entry["url"] = url
                    name, _, tag = key.partition(".")
                    cfgs.setdefault(name, {})[tag] = entry
            elif fname == "register_model_deprecations" and \
                    len(node.args) >= 2 and isinstance(node.args[1],
                                                       ast.Dict):
                for k, v in zip(node.args[1].keys, node.args[1].values):
                    if isinstance(k, ast.Constant):
                        deps[k.value] = lit(v)
    return cfgs, deps


def main():
    all_cfgs = {}
    all_deps = {}
    for fn in sorted(os.listdir(REF)):
        if not fn.endswith(".py"):
            continue
        cfgs, deps = extract(os.path.join(REF, fn))
        for name, tags in cfgs.items():
            all_cfgs.setdefault(name, {}).update(tags)
        all_deps.update(deps)
    with open(OUT, "w") as f:
        json.dump({"cfgs": all_cfgs, "deprecations": all_deps}, f,
                  sort_keys=True)
    n_tags = sum(len(t) for t in all_cfgs.values())
    print(f"{len(all_cfgs)} models, {n_tags} tag cfgs, "
          f"{len(all_deps)} deprecations")


if __name__ == "__main__":
    main()
