"""NN layer: flax modules and the YAML->graph model compiler."""

from experiment_yolo_tpu.nn.tasks import DetectionModel, GraphModel, parse_model, yaml_model_load

__all__ = ["DetectionModel", "GraphModel", "parse_model", "yaml_model_load"]
