from linkgraph.plans.superstep import SuperstepRunner, barrier  # noqa: F401
