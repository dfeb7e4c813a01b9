"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.magnet_link
(or run `python -m pytorch_geometric_signed_directed_tpu magnet_link`)."""
from pytorch_geometric_signed_directed_tpu.experiments.magnet_link import main

if __name__ == "__main__":
    main()
