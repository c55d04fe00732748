// SimilarityMap.tsx: 2-D PCA of the DINO embedding store; click a point
// for that video's nearest neighbors.
import {api, h, main, esc, short, fmt, table} from "/static/app.js";

export default async function SimilarityMap() {
  let data;
  try { data = await api("/api/analysis/similarity/map"); }
  catch (e) {
    return main.append(h(`<div class="panel">${esc(e.message)}
      — analyze at least two videos first.</div>`));
  }
  const pts = data.points;
  const xs = pts.map(p => p.x), ys = pts.map(p => p.y);
  const [x0, x1] = [Math.min(...xs), Math.max(...xs)];
  const [y0, y1] = [Math.min(...ys), Math.max(...ys)];
  const W = 720, H = 440, pad = 30;
  const sx = v => pad + (v - x0) / Math.max(x1 - x0, 1e-9) * (W - 2 * pad);
  const sy = v => pad + (v - y0) / Math.max(y1 - y0, 1e-9) * (H - 2 * pad);
  const dots = pts.map((p, i) => {
    const color = p.label == null ? "#8b96a5" :
      p.label ? "var(--bad)" : "var(--ok)";
    return `<circle cx="${sx(p.x)}" cy="${sy(p.y)}" r="7" fill="${color}"
      opacity="0.85" style="cursor:pointer" data-i="${i}">
      <title>${esc(p.video_id)}</title></circle>`;
  }).join("");
  main.append(h(`<div class="panel"><h2>Embedding similarity map
      <span class="dim">(PCA of DINO embeddings — red lame, green sound,
      grey unlabeled; click a point)</span></h2>
    <svg width="${W}" height="${H}" style="background:var(--bg);
      border-radius:8px" id="map">${dots}</svg></div>
    <div id="nn"></div>`));

  document.getElementById("map").onclick = async (ev) => {
    const i = ev.target.dataset && ev.target.dataset.i;
    if (i == null) return;
    const p = pts[+i];
    const nn = document.getElementById("nn");
    nn.innerHTML = `<div class="panel"><h2>${esc(short(p.video_id, 14))}
      <button class="mini" onclick="go('analysis','${p.video_id}')">
      analysis</button></h2><span class="dim">loading neighbors…</span></div>`;
    try {
      const d = await api(`/api/analysis/${p.video_id}/dinov3`);
      const sim = d.similar_cases || [];
      nn.firstElementChild.lastElementChild.outerHTML = sim.length
        ? table(sim, [
            ["neighbor", s => `<span class="dim">${short(s.video_id, 14)}</span>`],
            ["cosine", s => fmt(s.similarity)],
            ["label", s => s.label == null ? "—" : s.label ? "lame" : "sound"],
            ["", s => `<button class="mini"
               onclick="go('analysis','${s.video_id}')">open</button>`]])
        : `<span class="dim">no stored neighbors</span>`;
    } catch (e) {
      nn.firstElementChild.lastElementChild.textContent = e.message;
    }
  };
}
