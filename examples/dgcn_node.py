"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.dgcn_node
(or run `python -m pytorch_geometric_signed_directed_tpu dgcn_node`)."""
from pytorch_geometric_signed_directed_tpu.experiments.dgcn_node import main

if __name__ == "__main__":
    main()
