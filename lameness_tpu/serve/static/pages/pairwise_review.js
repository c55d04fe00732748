// PairwiseReview.tsx: Elo active-sampled pair, vote with strength +
// confidence, keyboard shortcuts, live rating feedback, current ranking.
import {api, h, main, fmt, esc, short, table, toast, ws} from "/static/app.js";

export default async function PairwiseReview() {
  let pair;
  try { pair = await api("/api/elo/next-pair"); }
  catch (e) {
    return main.append(h(`<div class="panel">${esc(e.message)}
      — upload at least two videos first.</div>`));
  }
  const stats = await api("/api/elo/stats");
  main.append(h(`<div class="panel"><h2>Which cow is more lame?
      <span class="dim">strategy: ${esc(pair.strategy || "")} ·
      ${stats.total_comparisons} comparisons so far</span></h2>
    <div class="vs">
      <div class="panel"><div class="dim">video 1 — press [1]</div>
        <video controls autoplay muted loop
          src="/api/videos/${pair.video_id_1}/stream"></video>
        <button class="action" id="v1">More lame</button></div>
      <div class="panel"><div class="dim">video 2 — press [2]</div>
        <video controls autoplay muted loop
          src="/api/videos/${pair.video_id_2}/stream"></video>
        <button class="action" id="v2">More lame</button></div>
    </div>
    <div class="row" style="justify-content:center;margin-top:10px">
      <button class="ghost" id="v0">Tie — press [0]</button>
      <label>strength <select id="deg"><option value="1">slight</option>
        <option value="2" selected>clear</option>
        <option value="3">strong</option></select></label>
      <label>confidence <select id="conf"><option>confident</option>
        <option>unsure</option></select></label>
      <button class="mini" id="skip">skip pair</button></div>
    <div id="feedback" class="dim" style="text-align:center"></div></div>
  <div class="panel"><h2>Current ranking (top 10)</h2><div id="rank"></div></div>`));

  async function vote(winner) {
    try {
      const r = await api("/api/elo/comparison", {json: {
        video_id_1: pair.video_id_1, video_id_2: pair.video_id_2,
        winner, degree: +document.getElementById("deg").value,
        confidence: document.getElementById("conf").value}});
      toast(`Elo: ${fmt(r.video_id_1.rating, 0)} vs ${fmt(r.video_id_2.rating, 0)}`);
      window.go("pairwise");
    } catch (e) { toast(e.message, "bad"); }
  }
  document.getElementById("v1").onclick = () => vote(1);
  document.getElementById("v2").onclick = () => vote(2);
  document.getElementById("v0").onclick = () => vote(0);
  document.getElementById("skip").onclick = () => window.go("pairwise");
  document.onkeydown = (e) => {
    if (e.target.tagName === "INPUT" || e.target.tagName === "SELECT") return;
    if (e.key === "1") vote(1);
    else if (e.key === "2") vote(2);
    else if (e.key === "0") vote(0);
  };

  const ranking = await api("/api/training/pairwise/ranking");
  document.getElementById("rank").innerHTML = ranking.length
    ? table(ranking.slice(0, 10), [
        ["#", r => r.rank_position ?? "—"],
        ["video", r => `<span class="dim">${short(r.video_id, 12)}</span>`],
        ["elo", r => fmt(r.elo_rating, 0)],
        ["±", r => fmt(r.elo_uncertainty, 0)],
        ["w/l/t", r => `${r.wins}/${r.losses}/${r.ties}`]])
    : `<span class="dim">no ratings yet — vote!</span>`;
}
