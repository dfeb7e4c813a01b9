"""4/5-class link sign+direction tasks, --method {sgcn,snea,sigat,sdgnn,
msgnn,sssnet} (reference examples/run_link_sign_direction_tasks.py)."""
from pytorch_geometric_signed_directed_tpu.experiments.\
    run_link_sign_direction_tasks import main

if __name__ == "__main__":
    main()
