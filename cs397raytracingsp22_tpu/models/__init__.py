"""Scene-description layer: camera, materials, primitives, scene compiler.

This is the user-facing API (reference layer L5/L2b analogue). Python
dataclasses describe the scene; `Scene.compile()` lowers them to the flat
SoA arrays the device-side ops consume.
"""
