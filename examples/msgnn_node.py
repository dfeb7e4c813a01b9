"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.msgnn_node
(or run `python -m pytorch_geometric_signed_directed_tpu msgnn_node`)."""
from pytorch_geometric_signed_directed_tpu.experiments.msgnn_node import main

if __name__ == "__main__":
    main()
