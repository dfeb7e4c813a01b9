"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.digrac
(or run `python -m pytorch_geometric_signed_directed_tpu digrac`)."""
from pytorch_geometric_signed_directed_tpu.experiments.digrac import main

if __name__ == "__main__":
    main()
