"""Wrapper: see pytorch_geometric_signed_directed_tpu.experiments.
run_link_sign_prediction (or `python -m pytorch_geometric_signed_directed_tpu
link_sign_prediction`)."""
from pytorch_geometric_signed_directed_tpu.experiments.run_link_sign_prediction import main

if __name__ == "__main__":
    main()
