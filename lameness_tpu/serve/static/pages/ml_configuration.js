// MLConfiguration.tsx: schema-aware editable hyperparameter form
// (routers/ml_config.py live-editable CatBoost/XGB/LGBM/ensemble/training).
import {api, h, main, esc, toast, USER} from "/static/app.js";

export default async function MLConfiguration() {
  const {config, schema} = await api("/api/ml-config");
  const params = await api("/api/models/parameters");
  const mstatus = await api("/api/ml-config/models/status");
  const privileged = USER && ["admin", "researcher"].includes(USER.role);

  const sections = Object.entries(config).map(([sec, vals]) => {
    const rows = Object.entries(vals).map(([k, v]) => {
      const meta = schema[`${sec}.${k}`] || {};
      const isNum = typeof v === "number";
      const input = typeof v === "object"
        ? `<input data-sec="${sec}" data-k="${k}" data-json="1"
            value='${esc(JSON.stringify(v))}' style="width:260px">`
        : `<input data-sec="${sec}" data-k="${k}" ${isNum ? 'type="number" step="any"' : ""}
            value="${esc(v)}" ${meta.min != null ? `min="${meta.min}"` : ""}
            ${meta.max != null ? `max="${meta.max}"` : ""} style="width:120px">`;
      return `<tr><td>${esc(k)}</td><td>${input}</td>
        <td class="dim">${esc(meta.description || "")}
          ${meta.min != null ? ` [${meta.min}–${meta.max}]` : ""}</td></tr>`;
    }).join("");
    return `<div class="panel"><h2>${esc(sec)}</h2>
      <table><tr><th>parameter</th><th>value</th><th></th></tr>${rows}</table></div>`;
  }).join("");

  const statusRows = Object.entries(mstatus).map(([slot, st]) =>
    `<tr><td>${esc(slot)}</td>
     <td>${st.loaded ? '<span class="badge ok">loaded</span>'
                     : '<span class="badge">not loaded</span>'}</td>
     <td>${st.file_exists ? "on disk" : "—"}</td></tr>`).join("");

  main.append(h(`${sections}
    ${privileged ? `<div class="row">
      <button class="action" id="save">Save configuration</button>
      <button class="ghost" id="reset">Reset to defaults</button>
      <span class="dim">persists to ml_config.json; the next training run
        uses it</span></div>` : `<div class="dim">read-only for raters</div>`}
    <div class="panel"><h2>GBDT model status</h2>
      <table><tr><th>slot</th><th>runtime</th><th>checkpoint</th></tr>
      ${statusRows}</table></div>
    <div class="panel"><h2>Deployed model parameters</h2>
      <pre>${esc(JSON.stringify(params, null, 2))}</pre></div>`));

  const reset = document.getElementById("reset");
  if (reset) reset.onclick = async () => {
    try {
      await api("/api/ml-config/reset", {method: "POST"});
      toast("reset to defaults"); window.go("mlconfig");
    } catch (e) { toast(e.message, "bad"); }
  };

  const save = document.getElementById("save");
  if (save) save.onclick = async () => {
    const cfg = JSON.parse(JSON.stringify(config));
    let bad = null;
    document.querySelectorAll("input[data-sec]").forEach(inp => {
      const {sec, k} = inp.dataset;
      if (inp.dataset.json) {
        try { cfg[sec][k] = JSON.parse(inp.value); }
        catch (e) { bad = `${sec}.${k}: invalid JSON`; }
      } else if (inp.type === "number") {
        cfg[sec][k] = +inp.value;
      } else cfg[sec][k] = inp.value;
    });
    if (bad) return toast(bad, "bad");
    try {
      await api("/api/ml-config", {method: "PUT", json: cfg});
      toast("saved");
    } catch (e) { toast(e.message, "bad"); }
  };
}
