"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.digcn_inception_link
(or run `python -m pytorch_geometric_signed_directed_tpu digcn_inception_link`)."""
from pytorch_geometric_signed_directed_tpu.experiments.digcn_inception_link import main

if __name__ == "__main__":
    main()
