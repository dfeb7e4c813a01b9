"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.sssnet
(or run `python -m pytorch_geometric_signed_directed_tpu sssnet`)."""
from pytorch_geometric_signed_directed_tpu.experiments.sssnet import main

if __name__ == "__main__":
    main()
