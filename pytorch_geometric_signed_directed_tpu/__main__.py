"""CLI: ``python -m pytorch_geometric_signed_directed_tpu <experiment>``.

``--list`` prints the registry; everything after the experiment name is
forwarded to that experiment's own argparse (try ``<experiment> --help``).
"""
import sys

from .experiments import EXPERIMENTS, run


def main():
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help", "--list"):
        print("usage: python -m pytorch_geometric_signed_directed_tpu "
              "<experiment> [options]\n\nexperiments:")
        for name, (_, desc) in sorted(EXPERIMENTS.items()):
            print(f"  {name:24s} {desc}")
        return
    run(argv[0], argv[1:])


if __name__ == "__main__":
    main()
