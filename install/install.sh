#!/usr/bin/env bash
# Install cosdata_tpu (parity with the reference's install/install.sh:
# places the package + config + data dirs under ~/cosdata-tpu and adds a
# start script to PATH).
set -euo pipefail

PREFIX="${COSDATA_PREFIX:-$HOME/cosdata-tpu}"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"

mkdir -p "$PREFIX"/{bin,config,data}
cp -r "$REPO_DIR/cosdata_tpu" "$PREFIX/"
cp -r "$REPO_DIR/csrc" "$PREFIX/"
cp -r "$REPO_DIR/proto" "$PREFIX/"
make -C "$PREFIX/csrc" >/dev/null

cat > "$PREFIX/config/config.toml" <<'TOML'
data_path = "DATA_PATH"
[server]
host = "127.0.0.1"
port = 8443
TOML
sed -i "s#DATA_PATH#$PREFIX/data#" "$PREFIX/config/config.toml"

cat > "$PREFIX/bin/start-cosdata" <<SH
#!/usr/bin/env bash
exec env PYTHONPATH="$PREFIX:\$PYTHONPATH" python -m cosdata_tpu \
  --config "$PREFIX/config/config.toml" "\$@"
SH
chmod +x "$PREFIX/bin/start-cosdata"

echo "Installed to $PREFIX"
echo "Add to PATH: export PATH=\"$PREFIX/bin:\$PATH\""
echo "Start with:  start-cosdata --admin-key <KEY>"
