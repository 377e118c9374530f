from cmw_tpu.sim.plant import PlantConfig, PlantState  # noqa: F401
