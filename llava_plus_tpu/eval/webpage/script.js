// Results browser over data.json (schema: {models, records[{question_id,
// category, question, answers{model}, scores{pair:[s1,s2]},
// evaluations{pair}}]}). Reference feature set (llava/eval/webpage/script.js):
// category/question/model selectors kept in sync, prev/next navigation that
// crosses category boundaries, winner trophy + header coloring, judge panel
// with the score pair in its header, expandable answer cards. The last
// listed model is "our" model (Assistant #2); the selector picks Assistant #1.
'use strict';

let DATA = null;
let questionIds = [];          // global order for prev/next
let currentQuestionId = null;
const byId = {};               // question_id -> record
const byCategory = {};         // category -> [question_id]

const $ = id => document.getElementById(id);

// Minimal markdown: escape, then **bold**, `code`, paragraphs on blank lines.
function renderMarkdown(text) {
  const esc = String(text ?? '(no answer)')
    .replace(/&/g, '&amp;').replace(/</g, '&lt;').replace(/>/g, '&gt;');
  const inline = esc
    .replace(/\*\*([^*]+)\*\*/g, '<strong>$1</strong>')
    .replace(/`([^`]+)`/g, '<code>$1</code>');
  return inline.trim().split(/\n{2,}|\n/).map(p => `<p>${p}</p>`).join('');
}

function capitalize(s) { return s ? s[0].toUpperCase() + s.slice(1) : s; }

// Model avatar (figures/<base>.svg): match on the leading model-family name,
// mirroring the reference's per-model icons (llava/eval/webpage/figures/).
const AVATARS = ['alpaca', 'bard', 'chatgpt', 'gpt', 'llama', 'vicuna', 'llava'];
function avatarFor(model) {
  const m = String(model || '').toLowerCase();
  for (const a of AVATARS) {
    if (m.startsWith(a)) return `figures/${a === 'llava' ? 'llava-tpu' : a === 'gpt' ? 'chatgpt' : a}.svg`;
  }
  return 'figures/llava-tpu.svg';
}
function setAvatar(imgId, model) {
  const img = $(imgId);
  if (img) { img.src = avatarFor(model); img.alt = model; }
}

function ourModel() { return DATA.models[DATA.models.length - 1]; }

function pairKey(other) {
  // review files are named review_<m1>_<m2>; try both orders.
  const us = ourModel();
  return [`${other}_${us}`, `${us}_${other}`];
}

function populate() {
  const catSel = $('category-select');
  DATA.records.forEach(r => {
    byId[r.question_id] = r;
    if (!(r.category in byCategory)) {
      byCategory[r.category] = [];
      const o = document.createElement('option');
      o.value = r.category;
      o.textContent = capitalize(r.category || '(uncategorized)');
      catSel.appendChild(o);
    }
    byCategory[r.category].push(r.question_id);
    questionIds.push(r.question_id);
  });

  const modelSel = $('model-select');
  DATA.models.slice(0, -1).forEach(m => {
    const o = document.createElement('option');
    o.value = m;
    o.textContent = m;
    modelSel.appendChild(o);
  });
  currentQuestionId = questionIds[0];
  syncSelectors();
  display();
}

function syncSelectors() {
  const rec = byId[currentQuestionId];
  $('category-select').value = rec.category;
  const qSel = $('question-select');
  qSel.innerHTML = '';
  byCategory[rec.category].forEach(qid => {
    const o = document.createElement('option');
    o.value = qid;
    o.textContent = `Q${qid}: ${byId[qid].question.slice(0, 80)}`;
    qSel.appendChild(o);
  });
  qSel.value = currentQuestionId;
}

function display() {
  const rec = byId[currentQuestionId];
  const other = $('model-select').value || DATA.models[0];
  const us = ourModel();

  $('selected-question').innerHTML =
    renderMarkdown(`**Question:** ${rec.question}`);
  $('other-model-answer').innerHTML = renderMarkdown(rec.answers[other]);
  $('our-model-answer').innerHTML = renderMarkdown(rec.answers[us]);

  // judge verdict
  let scores = null, evalText = '';
  for (const k of pairKey(other)) {
    if (rec.scores && k in rec.scores) {
      scores = rec.scores[k];
      evalText = (rec.evaluations || {})[k] || '';
      if (k.startsWith(us)) scores = [scores[1], scores[0]]; // normalize order
      break;
    }
  }

  let title1 = 'Assistant #1';
  let title2 = `Assistant #2 (${us}, our model)`;
  let label1 = '', label2 = '';
  const cardColors = { win: 'var(--win)', lose: 'var(--lose)', tie: 'var(--tie)' };
  let c1 = '', c2 = '';
  if (scores) {
    label1 = `${scores[0]}/10`;
    label2 = `${scores[1]}/10`;
    if (scores[0] === scores[1]) {
      title1 = '\u{1F3C6} ' + title1; title2 = '\u{1F3C6} ' + title2;
      label1 = '\u{1F3C6} ' + label1; label2 = '\u{1F3C6} ' + label2;
      c1 = c2 = cardColors.tie;
    } else if (scores[0] > scores[1]) {
      title1 = '\u{1F3C6} ' + title1; label1 = '\u{1F3C6} ' + label1;
      c1 = cardColors.win; c2 = cardColors.lose;
    } else {
      title2 = '\u{1F3C6} ' + title2; label2 = '\u{1F3C6} ' + label2;
      c1 = cardColors.lose; c2 = cardColors.win;
    }
    $('evaluation-header').textContent =
      `GPT-4 Evaluation (Score: ${other} ${scores[0]}/10, ${us} ${scores[1]}/10)`;
  } else {
    $('evaluation-header').textContent = 'GPT-4 Evaluation (no review)';
  }
  $('other-model-title').textContent = title1;
  $('our-model-title').textContent = title2;
  setAvatar('other-model-avatar', other);
  setAvatar('our-model-avatar', us);
  $('other-score-label').textContent = label1;
  $('our-score-label').textContent = label2;
  $('other-model-header').style.backgroundColor = c1;
  $('our-model-header').style.backgroundColor = c2;
  $('evaluation-result').innerHTML = renderMarkdown(evalText);

  document.querySelectorAll('.expandable-card').forEach(card => {
    card.classList.remove('expanded');
    updateExpandButton(card);
  });
}

function updateExpandButton(card) {
  const container = card.querySelector('.card-text-container');
  const btn = card.querySelector('.expand-btn');
  const overflowing = container.scrollHeight > container.offsetHeight + 1;
  btn.style.display = overflowing ? 'block' : 'none';
  if (!overflowing) card.classList.add('expanded');
  btn.textContent = card.classList.contains('expanded')
    ? 'Show less ▴' : 'Show more ▾';
}

function step(delta) {
  const i = questionIds.indexOf(currentQuestionId);
  const j = Math.min(questionIds.length - 1, Math.max(0, i + delta));
  currentQuestionId = questionIds[j];
  syncSelectors();
  display();
}

document.addEventListener('click', e => {
  if (!e.target.classList.contains('expand-btn')) return;
  const card = e.target.closest('.expandable-card');
  card.classList.toggle('expanded');
  updateExpandButton(card);
});

$('category-select').addEventListener('change', e => {
  currentQuestionId = byCategory[e.target.value][0];
  syncSelectors();
  display();
});
$('question-select').addEventListener('change', e => {
  currentQuestionId = isNaN(+e.target.value) ? e.target.value : +e.target.value;
  display();
});
$('model-select').addEventListener('change', display);
$('prev-question').addEventListener('click', () => step(-1));
$('next-question').addEventListener('click', () => step(1));

fetch('data.json')
  .then(r => r.json())
  .then(d => { DATA = d; populate(); })
  .catch(err => {
    document.querySelector('main').innerHTML =
      `<p class="error">Failed to load data.json: ${err}</p>`;
  });
