from neural_imaging_tpu.workflows.manipulation_classification import ManipulationClassification  # noqa: F401
