"""Wrapper for the MSGNN 4/5-class sign+direction tasks (reference
examples/run_link_sign_direction_tasks.py); same recipe as msgnn_link."""
from pytorch_geometric_signed_directed_tpu.experiments.msgnn_link import main

if __name__ == "__main__":
    main()
