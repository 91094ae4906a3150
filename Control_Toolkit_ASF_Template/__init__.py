"""Application-Specific Files (ASF) template.

The extension contract (capability parity with the reference
Control_Toolkit_ASF_Template, /root/reference/Control_Toolkit_ASF_Template):
copy this folder into your application as ``Control_Toolkit_ASF``, then

1. add controllers in ``controllers/`` and cost functions in
   ``cost_functions/`` — registered with the ``asf=True`` decorator tier so
   they SHADOW same-named built-ins,
2. edit the three YAML configs (config_controllers.yml,
   config_optimizers.yml, config_cost_function.yml),
3. point the toolkit at the folder:

       import control_toolkit_tpu as ctt
       ctt.set_asf_config_dir("path/to/Control_Toolkit_ASF")
       ctt.registry.load_asf_package("your_app.Control_Toolkit_ASF")

Importing this package pulls in every plugin module so their registrations
run.
"""
from Control_Toolkit_ASF_Template.controllers import controller_barebone  # noqa: F401
from Control_Toolkit_ASF_Template.cost_functions import cost_function_barebone  # noqa: F401
