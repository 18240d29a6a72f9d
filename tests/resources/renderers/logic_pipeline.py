# -*- coding: utf-8 -*-
"""Pipeline `logic_2` rendered as a standalone script.

Two chained ANDs.
"""

from kiara_spark.api import KiaraAPI

api = KiaraAPI.instance()

# =============================================================================
# Pipeline inputs — edit the values marked <TODO_SET_INPUT> before running.
pipeline_input_a = True
pipeline_input_b = True
pipeline_input_c = True
# =============================================================================

# -- processing stage 1 -----------------------------------------------------

# step: and_1
inputs_and_1 = {
    "a": pipeline_input_a,
    "b": pipeline_input_b,
}
results_and_1 = api.run_job(
    "logic.and", inputs=inputs_and_1,
    comment="rendered pipeline step")
# -- processing stage 2 -----------------------------------------------------

# step: and_2
inputs_and_2 = {
    "a": results_and_1['y'],
    "b": pipeline_input_c,
}
results_and_2 = api.run_job(
    "logic.and", inputs=inputs_and_2,
    comment="rendered pipeline step")

# -- pipeline outputs ---------------------------------------------------------
pipeline_result_y = results_and_2["y"]
print("pipeline result y:")
print(api.get_value_str(pipeline_result_y))
