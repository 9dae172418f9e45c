from linkgraph.plans.superstep import SuperstepRunner, barrier, release  # noqa: F401
