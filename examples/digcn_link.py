"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.digcn_link
(or run `python -m pytorch_geometric_signed_directed_tpu digcn_link`)."""
from pytorch_geometric_signed_directed_tpu.experiments.digcn_link import main

if __name__ == "__main__":
    main()
