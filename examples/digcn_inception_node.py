"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.digcn_inception_node
(or run `python -m pytorch_geometric_signed_directed_tpu digcn_inception_node`)."""
from pytorch_geometric_signed_directed_tpu.experiments.digcn_inception_node import main

if __name__ == "__main__":
    main()
