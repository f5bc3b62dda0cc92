"""Scene input: USDA parsing, mesh processing, scene graph flattening."""
