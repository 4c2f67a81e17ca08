"""Model families: YOLO task triples (trainer/validator/predictor per task)."""
