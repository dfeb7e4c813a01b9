"""Generate the markdown API reference from the package's docstrings.

Counterpart of the reference's Sphinx tree (docs/source/modules/
{model,data,utils}.rst — autodoc over the public API); here the docs are
emitted as markdown straight from the live package so signatures and
reference citations (file:line pointers kept in docstrings) never drift.

Run: python scripts/gen_api_docs.py      (writes docs/api/*.md)
"""
import importlib
import inspect
import os
import sys
import textwrap

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = "pytorch_geometric_signed_directed_tpu"
SECTIONS = [
    ("nn", "Models and convolution layers",
     "Counterpart of the reference's nn/ namespace "
     "(docs/source/modules/model.rst)."),
    ("data", "Data classes, loaders, and synthetic generators",
     "Counterpart of the reference's data/ namespace "
     "(docs/source/modules/data.rst)."),
    ("utils", "Graph utilities, splits, losses, and evaluation",
     "Counterpart of the reference's utils/ namespace "
     "(docs/source/modules/utils.rst)."),
    ("spectral", "Host-side spectral preprocessing",
     "Magnetic/signed Laplacians, PPR adjacencies, spectral features — "
     "the reference keeps these inside utils/; they are a separate tier "
     "here because they run once on host, outside jit."),
    ("ops", "TPU kernel tier (SpMM, segment ops, graph ops)",
     "No reference counterpart: the reference delegates to "
     "torch_scatter/torch_sparse C++ kernels (SURVEY.md §2.6); this tier "
     "is the TPU-native replacement (XLA segment ops + Pallas MXU "
     "kernels)."),
    ("parallel", "Multi-chip sharding",
     "No reference counterpart (the reference is single-device, "
     "SURVEY.md §2.7): mesh utilities, GSPMD-sharded and "
     "owner-computes/shard_map execution of every propagator tier."),
    ("train", "Training harnesses, checkpointing, profiling",
     "The reference keeps training loops in examples/; this is the "
     "importable equivalent."),
]


def _signature(obj) -> str:
    try:
        sig = inspect.signature(obj)
    except (ValueError, TypeError):
        return ""
    # drop flax Module plumbing params from the public docs
    params = [p for n, p in sig.parameters.items()
              if n not in ("parent", "name")]
    return str(sig.replace(parameters=params,
                           return_annotation=inspect.Signature.empty))


def _doc(obj) -> str:
    d = (inspect.getdoc(obj) or "").strip()
    # dataclass/flax auto-docs just repeat the signature — treat as absent
    name = getattr(obj, "__name__", "\x00")
    if d.startswith(f"{name}("):
        return ""
    return d


def render_module(modname: str, title: str, blurb: str) -> str:
    mod = importlib.import_module(f"{PKG}.{modname}")
    names = list(getattr(mod, "__all__", []))
    lines = [f"# `{PKG}.{modname}` — {title}", "", blurb, ""]
    for name in names:
        obj = getattr(mod, name)
        kind = ("class" if inspect.isclass(obj)
                else "function" if callable(obj) else "value")
        sig = _signature(obj) if kind == "function" else ""
        lines.append(f"## `{name}{sig}`")
        lines.append("")
        if kind == "class":
            sig = _signature(obj)
            if sig:
                lines.append(f"`class {name}{sig}`")
                lines.append("")
        doc = _doc(obj)
        if not doc and inspect.isclass(obj) and "__call__" in vars(obj):
            doc = _doc(vars(obj)["__call__"])
        if doc:
            lines.append(doc)
        else:
            owner = inspect.getmodule(obj)
            odoc = (inspect.getdoc(owner) or "") if owner else ""
            first = odoc.strip().splitlines()[0] if odoc.strip() else ""
            lines.append(first or "(undocumented)")
        lines.append("")
        if inspect.isclass(obj):
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                mdoc = _doc(meth)
                if not mdoc:
                    continue
                head = mdoc.splitlines()[0]
                lines.append(f"- **`.{mname}{_signature(meth)}`** — {head}")
            lines.append("")
    return "\n".join(lines)


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "docs", "api")
    os.makedirs(outdir, exist_ok=True)
    index = ["# API reference", "",
             "Generated from the live package docstrings by "
             "`scripts/gen_api_docs.py`; reference counterparts are cited "
             "as `file:line` into the upstream repo.", ""]
    for modname, title, blurb in SECTIONS:
        md = render_module(modname, title, blurb)
        path = os.path.join(outdir, f"{modname}.md")
        with open(path, "w") as f:
            f.write(md + "\n")
        mod = importlib.import_module(f"{PKG}.{modname}")
        index.append(f"- [`{PKG}.{modname}`]({modname}.md) — {title} "
                     f"({len(getattr(mod, '__all__', []))} public symbols)")
        print(f"wrote {path}")
    with open(os.path.join(outdir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(textwrap.dedent(f"wrote {outdir}/index.md"))


if __name__ == "__main__":
    main()
