"""Engine: model facade, trainer, validator, predictor, exporter, results."""
