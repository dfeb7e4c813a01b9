"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.digcl_link
(or run `python -m pytorch_geometric_signed_directed_tpu digcl_link`)."""
from pytorch_geometric_signed_directed_tpu.experiments.digcl_link import main

if __name__ == "__main__":
    main()
