"""Build dist/engine.zip for spark-submit --py-files: the package plus its
resources (the compiled ontology dictionary ships inside the zip — Python's
zipimport serves the .py files; the JSON resource is extracted via
importlib-compatible open, so refmap.ontology reads it through the zip via
a fallback copy next to the zip)."""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "case_uco_ontology_map_spark"


def main() -> None:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    zip_path = os.path.join(dist, "engine.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fname in filenames:
                if fname.endswith((".py", ".json")):
                    full = os.path.join(dirpath, fname)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(zip_path)


if __name__ == "__main__":
    main()
