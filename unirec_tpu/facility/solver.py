"""Driver for closed-form / non-SGD models (reference facility/solver.py:10-39):
build the user-item graph, call model.solve once, evaluate, persist."""
from __future__ import annotations

import os
import pickle
import time
from typing import Any, Dict, Optional

from unirec_tpu.constants import EvalProtocol
from unirec_tpu.facility.evaluation import build_evaluator
from unirec_tpu.utils.logger import setup_logger


class Solver:
    def __init__(self, config: Dict[str, Any], model, mesh=None):
        self.config = config
        self.model = model
        self.mesh = mesh
        self.exp_name = config.get("exp_name", "unirec_tpu")
        self.logger = setup_logger(self.exp_name, config.get("output_path"))
        self.user_history = None
        self.evaluator = None
        self.best_valid_result = None
        self.saved_model_file = os.path.join(
            config.get("output_path", "."),
            config.get("checkpoint_dir", "checkpoint"),
            f"{self.exp_name}.solver.pkl")

    def set_user_history(self, history):
        self.user_history = history

    def reset_evaluator(self, data_format=None, eval_protocol=None):
        self.evaluator = build_evaluator(self.config, self.model, eval_protocol,
                                         data_format, self.mesh)
        self._eval_protocol = eval_protocol

    def fit(self, graph, valid_data=None, save_model: bool = True, **kwargs):
        t0 = time.time()
        self.model.solve(graph)
        self.logger.info("solve() finished in %.2fs", time.time() - t0)
        result = None
        if valid_data is not None:
            result = self.evaluate(valid_data)
            self.best_valid_result = result
            self.logger.info("valid result: %s", result)
        if save_model:
            self.save_model(self.saved_model_file)
        return result

    def evaluate(self, eval_data, load_best_model: bool = False,
                 model_file: Optional[str] = None, predict_only: bool = False,
                 verbose: int = 0):
        if load_best_model:
            self.load_model(model_file or self.saved_model_file)
        protocol = getattr(self, "_eval_protocol", None) or \
            eval_data.config.get("eval_protocol")
        if predict_only:
            return self.evaluator.predict_scores(eval_data, None, None)
        if protocol == EvalProtocol.ONE_VS_ALL.value:
            return self.evaluator.evaluate_full(eval_data, None, self.user_history, None)
        return self.evaluator.evaluate(eval_data, None, None)

    def save_model(self, filename: str):
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        cfg = {k: v for k, v in self.config.items() if not k.startswith("_")}
        with open(filename, "wb") as f:
            pickle.dump({"config": cfg, "state": self.model.state_dict()}, f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        self.logger.info("Saved solver model to %s", filename)

    def load_model(self, filename: str):
        with open(filename, "rb") as f:
            ckpt = pickle.load(f)
        self.model.load_state_dict(ckpt["state"])
