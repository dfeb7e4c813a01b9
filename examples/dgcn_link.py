"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.dgcn_link
(or run `python -m pytorch_geometric_signed_directed_tpu dgcn_link`)."""
from pytorch_geometric_signed_directed_tpu.experiments.dgcn_link import main

if __name__ == "__main__":
    main()
