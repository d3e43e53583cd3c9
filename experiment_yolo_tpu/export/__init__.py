"""Export backends: StableHLO / SavedModel / TFLite via engine.exporter; ONNX via onnx_export."""
