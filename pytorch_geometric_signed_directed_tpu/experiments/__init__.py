"""Runnable experiment recipes — the reference's examples/ as a package.

The reference ships its training loops as standalone argparse scripts
(/root/reference/examples/*.py); here each is an importable module with a
``main(argv)`` entry point, dispatched by ``python -m
pytorch_geometric_signed_directed_tpu <experiment> [options]`` (see
__main__.py).  Thin wrappers remain under examples/ for script parity.
"""

EXPERIMENTS = {
    "magnet_node": ("magnet_node", "MagNet node classification"),
    "magnet_link": ("magnet_link", "MagNet link/direction prediction"),
    "digcn_inception_node": ("digcn_inception_node",
                             "DiGCN inception-block node classification"),
    "digcl_node": ("digcl_node", "DiGCL contrastive node embedding"),
    "digrac": ("digrac", "DIGRAC directed flow clustering"),
    "msgnn_link": ("msgnn_link", "MSGNN signed-directed link tasks"),
    "sssnet": ("sssnet", "SSSNET semi-supervised signed clustering"),
    "link_sign_prediction": ("run_link_sign_prediction",
                             "SGCN/SNEA/SiGAT/SDGNN link-sign prediction"),
}


def run(name, argv=None):
    import importlib

    if name not in EXPERIMENTS:
        raise SystemExit(
            f"unknown experiment '{name}'; available: "
            + ", ".join(sorted(EXPERIMENTS)))
    mod = importlib.import_module(f"{__name__}.{EXPERIMENTS[name][0]}")
    return mod.main(argv)
