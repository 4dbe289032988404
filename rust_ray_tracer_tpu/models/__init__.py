"""Scene representation (structure-of-arrays), scene library, glTF import."""
