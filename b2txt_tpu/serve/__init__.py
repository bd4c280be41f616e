from .service import DecoderService, FinalOutput, lm_order_to_model_order
